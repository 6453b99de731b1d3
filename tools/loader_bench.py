#!/usr/bin/env python
"""Measure DataLoader throughput on a synthetic SRN tree (VERDICT r4 #6).

Generates (once) a flagship-shaped synthetic SRN dataset and times the
loader at several worker counts, with and without the decoded-image RAM
cache.  A flagship train step is ~114 ms for 8 scenes x 50 views of 128^2
PNGs, so the loader must sustain >= 10 batches/s to never starve the TPU.

Usage: python tools/loader_bench.py [--dir /tmp/srn_bench] [--scenes 32]
           [--views 50] [--size 128] [--batches 20]
"""
import argparse
import os
import subprocess
import sys
import time

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _repo)

from ssdnerf_tpu.data.builder import DataLoader  # noqa: E402
from ssdnerf_tpu.data.shapenet_srn import ShapeNetSRN  # noqa: E402


def time_loader(dataset, batch_size, num_workers, n_batches, warmup=2):
    loader = DataLoader(dataset, batch_size=batch_size, shuffle=True,
                        num_workers=num_workers, prefetch=4)
    it = iter(loader)
    for _ in range(warmup):
        next(it)
    t0 = time.perf_counter()
    for _ in range(n_batches):
        next(it)
    dt = time.perf_counter() - t0
    loader.close()
    return n_batches / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--dir', default='/tmp/srn_loader_bench')
    ap.add_argument('--scenes', type=int, default=32)
    ap.add_argument('--views', type=int, default=50)
    ap.add_argument('--size', type=int, default=128)
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--batches', type=int, default=20)
    args = ap.parse_args()

    if not os.path.isdir(args.dir) or not os.listdir(args.dir):
        print(f'generating synthetic SRN tree at {args.dir} ...', flush=True)
        subprocess.check_call([
            sys.executable, os.path.join(_repo, 'tools/make_synthetic_srn.py'),
            args.dir, '--scenes', str(args.scenes), '--views',
            str(args.views), '--size', str(args.size)])

    for cache in (False, True):
        ds = ShapeNetSRN(data_prefix=args.dir, cache_decoded=cache)
        for workers in (0, 4, 8, 16):
            rate = time_loader(ds, args.batch, workers, args.batches)
            imgs = rate * args.batch * args.views
            print(f'cache={int(cache)} workers={workers:2d}: '
                  f'{rate:6.2f} batches/s ({imgs:7.0f} imgs/s)', flush=True)


if __name__ == '__main__':
    main()
