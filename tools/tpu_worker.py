#!/usr/bin/env python
"""Persistent TPU experiment worker.

The axon backend stalls new client connections for 5-10 minutes after a
previous client exits (see .claude/skills/verify/SKILL.md), so iterative
hardware work must reuse ONE process.  This worker connects to the TPU
once, then polls a queue directory for ``*.py`` job files, executes each
in-process in a persistent shared namespace (so compiled functions and
arrays persist across jobs), and writes ``<job>.out`` (stdout+stderr) and
``<job>.done`` (exit status) next to it.

Usage:   python tools/tpu_worker.py [queue_dir]   (default /tmp/tpuq)
Submit:  cp myprobe.py /tmp/tpuq/ ; wait for /tmp/tpuq/myprobe.py.done
Stop:    touch /tmp/tpuq/STOP
"""
import io
import os
import sys
import time
import traceback
import contextlib

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QDIR = sys.argv[1] if len(sys.argv) > 1 else '/tmp/tpuq'
os.makedirs(QDIR, exist_ok=True)


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir',
                      os.path.expanduser('~/.cache/jax_comp_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)
    print('devices:', jax.devices(), flush=True)
    ns = {'__name__': '__tpu_worker__'}
    done = set()
    for f in os.listdir(QDIR):
        if f.endswith('.done'):
            done.add(f[:-5])
    print('worker ready, polling', QDIR, flush=True)
    while True:
        if os.path.exists(os.path.join(QDIR, 'STOP')):
            print('STOP seen, exiting', flush=True)
            return
        jobs = sorted(f for f in os.listdir(QDIR)
                      if f.endswith('.py') and f not in done)
        for job in jobs:
            path = os.path.join(QDIR, job)
            done.add(job)
            print(f'=== running {job} ===', flush=True)
            buf = io.StringIO()
            ok = True
            t0 = time.time()
            try:
                with open(path) as fh:
                    src = fh.read()
                with contextlib.redirect_stdout(buf), \
                        contextlib.redirect_stderr(buf):
                    exec(compile(src, path, 'exec'), ns)
            except BaseException:
                ok = False
                buf.write(traceback.format_exc())
            dt = time.time() - t0
            out = buf.getvalue()
            with open(path + '.out', 'w') as fh:
                fh.write(out)
            with open(path + '.done', 'w') as fh:
                fh.write(f'{"OK" if ok else "FAIL"} {dt:.1f}s\n')
            print(out, flush=True)
            print(f'=== {job}: {"OK" if ok else "FAIL"} ({dt:.1f}s) ===',
                  flush=True)
        time.sleep(0.5)


if __name__ == '__main__':
    main()
