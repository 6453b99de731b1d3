#!/usr/bin/env python
"""Deterministic-replay bisect of a ModelUpdaterHook transition.

When a training run degrades right after a scheduled config transition
(the reference's model_updater.py surgeries — ess/freeze_norm/
pack_slots/march_slots swaps), this tool resumes a checkpoint saved just
before the boundary and re-runs a short window once per INDIVIDUAL
delta, reporting the first non-finite loss for each.  Training here is
deterministic (fold_in(base_key, iteration) + deterministic batch
order), so the healthy prefix replays bit-for-bit and the failing delta
is isolated exactly.  This is the harness that found the round-5
packed-composite NaN (PERF.md "Round-5 soak").

Usage:
  python tools/bisect_transition.py CONFIG CKPT \
      --deltas '{"decoder.pack_slots": 512}' \
               '{"train_cfg.extra_scene_step": 1}' \
      [--iters 60] [--work-dir /tmp/bisect]

Each --deltas argument is a JSON dict applied alone via a
ModelUpdaterHook five iterations after the resume point.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('config')
    ap.add_argument('checkpoint')
    ap.add_argument('--deltas', nargs='+', required=True,
                    help='JSON dicts, one ModelUpdater cfg each')
    ap.add_argument('--iters', type=int, default=60,
                    help='iterations to run past the resume point')
    ap.add_argument('--work-dir', default='/tmp/bisect_transition')
    args = ap.parse_args()

    from ssdnerf_tpu.config import Config
    from ssdnerf_tpu.apis import train_model
    from ssdnerf_tpu.core.checkpoint import load_checkpoint

    _, start_iter, _ = load_checkpoint(args.checkpoint)
    print(f'checkpoint at iteration {start_iter}')
    results = {}
    for i, raw in enumerate(args.deltas):
        delta = json.loads(raw)
        tag = f'd{i}_' + '_'.join(k.split('.')[-1] for k in delta)
        print(f'===== {tag}: {delta} =====', flush=True)
        cfg = Config.fromfile(args.config)
        wd = os.path.join(args.work_dir, tag)
        cfg['total_iters'] = start_iter + args.iters
        cfg['evaluation'] = []
        cfg['log_config'] = dict(interval=1,
                                 hooks=[dict(type='TextLoggerHook')])
        cfg['checkpoint_config'] = dict(interval=10 ** 9, max_keep_ckpts=1)
        hooks = [h for h in cfg.get('custom_hooks', [])
                 if h.get('type') != 'ModelUpdaterHook']
        hooks.append(dict(type='ModelUpdaterHook',
                          step=[start_iter + 5], cfgs=[delta],
                          by_epoch=False))
        cfg['custom_hooks'] = hooks
        runner = train_model(cfg, work_dir=wd,
                             resume_from=args.checkpoint)
        import numpy as np
        lv = runner.last_log_vars
        # quartile logs are legitimately NaN when a timestep quartile is
        # empty in the last batch (models/losses.py) — not a failure
        bad = [k for k, v in lv.items()
               if k.startswith('loss') and 'quartile' not in k
               and not np.isfinite(float(v))]
        results[tag] = 'NON-FINITE: ' + ','.join(bad) if bad else 'healthy'
        print(f'{tag}: {results[tag]}', flush=True)

    print('\n===== verdict =====')
    for tag, r in results.items():
        print(f'{tag}: {r}')


if __name__ == '__main__':
    main()
