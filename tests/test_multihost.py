"""Two-process multi-host smoke test (VERDICT r4 #7).

Launches two REAL processes joined via ``jax.distributed.initialize`` on
CPU, each running ``train_model`` with ``world_size=2`` on a shared
synthetic SRN tree, and asserts:

- both processes see ``jax.process_count() == 2`` and finish 2 iterations,
- the data shards and scene-cache shards are disjoint and cover the
  dataset (the reference's split_data DistributedSampler + per-rank cache
  semantics, lib/apis/train.py:86-98, multiscene_nerf.py:44-51),
- the eval log-var allgather (apis/test.py allgather_weighted_sums,
  lib/apis/test.py:58-69) aggregates to the dataset-wide weighted mean on
  EVERY rank.
"""
import json
import os
import socket
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(('localhost', 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_train_and_allgather(tmp_path):
    data_dir = str(tmp_path / 'srn')
    subprocess.check_call(
        [sys.executable, os.path.join(ROOT, 'tools/make_synthetic_srn.py'),
         data_dir, '--scenes', '6', '--views', '2', '--size', '16'],
        env=dict(os.environ, JAX_PLATFORMS='cpu'))

    port = _free_port()
    procs, outs = [], []
    for pid in range(2):
        out_json = str(tmp_path / f'out_{pid}.json')
        outs.append(out_json)
        env = dict(os.environ, JAX_PLATFORMS='cpu')
        env.pop('XLA_FLAGS', None)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(ROOT, 'tests/multihost_worker.py'),
             str(pid), str(port), data_dir,
             str(tmp_path / f'wd_{pid}'), out_json],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=900)
        logs.append(stdout.decode(errors='replace'))
    for pid, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f'worker {pid} failed:\n{log[-4000:]}'
        assert 'WORKER-OK' in log

    results = [json.load(open(o)) for o in outs]
    assert all(r['process_count'] == 2 for r in results)
    # disjoint, covering data shards
    ids0, ids1 = (set(r['owned_scene_ids']) for r in results)
    assert not (ids0 & ids1), (ids0, ids1)
    assert ids0 | ids1 == set(range(6))
    # disjoint, covering cache shards
    sh0, sh1 = results[0]['cache_shard'], results[1]['cache_shard']
    assert sh0[1] == sh1[0] and sh0[0] == 0 and sh1[1] == 6, (sh0, sh1)
    # allgather: every rank holds the dataset-wide weighted mean 5/3
    for r in results:
        assert abs(r['agg_mean'] - 5.0 / 3.0) < 1e-6, r['agg_mean']
    # both ranks actually trained (loss log vars present)
    assert all(r['loss_keys'] for r in results)
