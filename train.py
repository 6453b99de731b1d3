#!/usr/bin/env python
"""Training CLI.

Mirrors the reference launcher surface (/root/reference/train.py:13-34 +
tools/train.py:126-238): ``python train.py CONFIG [--work-dir D]
[--resume-from CKPT] [--seed N] [--cfg-options k=v ...]``.  On TPU there is
no per-GPU process spawning — one process drives the local mesh; multi-host
pods initialize via jax.distributed.
"""
import argparse
import os
import sys


def parse_args():
    parser = argparse.ArgumentParser(description='Train SSDNeRF (TPU)')
    parser.add_argument('config', help='config file path')
    parser.add_argument('--work-dir', default=None)
    parser.add_argument('--resume-from', default=None)
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--max-iters', type=int, default=None,
                        help='override total_iters (debug)')
    parser.add_argument('--gpu-ids', nargs='+', type=int, default=None,
                        help='accepted for CLI parity; ignored on TPU')
    parser.add_argument('--diff-seed', action='store_true',
                        help='different rng seed per process')
    parser.add_argument('--multi-host', action='store_true',
                        help='initialize jax.distributed for TPU pods')
    parser.add_argument('--cfg-options', nargs='+', default=[])
    return parser.parse_args()


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    args = parse_args()
    import jax
    if args.multi_host:
        jax.distributed.initialize()
    from ssdnerf_tpu.config import Config, parse_cfg_option
    from ssdnerf_tpu.apis import train_model

    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_dict(dict(parse_cfg_option(kv)
                                 for kv in args.cfg_options))
    rank = jax.process_index()
    world_size = jax.process_count()
    seed = args.seed + (rank if args.diff_seed else 0)
    work_dir = args.work_dir or cfg.get(
        'work_dir', os.path.join('work_dirs',
                                 os.path.splitext(
                                     os.path.basename(args.config))[0]))
    resume_from = args.resume_from or cfg.get('resume_from')
    train_model(cfg, work_dir=work_dir, resume_from=resume_from,
                seed=seed, rank=rank, world_size=world_size,
                max_iters=args.max_iters)


if __name__ == '__main__':
    main()
