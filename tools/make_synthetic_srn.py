#!/usr/bin/env python
"""Generate a view-consistent synthetic dataset in ShapeNet-SRN layout.

Writes analytic multi-sphere scenes (Lambertian shading, exact
multi-view consistency — the same scenes the validation harnesses train
on, tests/synthetic.py) as standard SRN directories::

    <out>/<scene>/intrinsics.txt
    <out>/<scene>/rgb/000000.png ...
    <out>/<scene>/pose/000000.txt ...

so the FULL CLI pipeline — ``train.py`` with a ``ShapeNetSRN`` data
prefix, ``test.py`` eval, cache writers, stage-2 handoff — runs
end-to-end in an image with no real SRN data (zero-egress environments).
Poses are written in the raw SRN frame (the dataset loader rescales
translations by 1/radius with radius=0.5, shapenet_srn.py).

Usage:
    python tools/make_synthetic_srn.py /tmp/srn_cars \\
        [--scenes 8] [--views 10] [--size 64] [--seed 0]
"""
import argparse
import os
import sys

import numpy as np

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _repo)
sys.path.insert(0, os.path.join(_repo, 'tests'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('out_dir')
    ap.add_argument('--scenes', type=int, default=8)
    ap.add_argument('--views', type=int, default=10)
    ap.add_argument('--size', type=int, default=64)
    ap.add_argument('--seed', type=int, default=0)
    args = ap.parse_args()

    import cv2
    from synthetic import make_sphere_batch

    data = make_sphere_batch(num_scenes=args.scenes, num_views=args.views,
                             h=args.size, w=args.size, seed=args.seed)
    focal = float(data['cond_intrinsics'][0, 0, 0])
    for s in range(args.scenes):
        scene = os.path.join(args.out_dir, f'sphere_{s:04d}')
        os.makedirs(os.path.join(scene, 'rgb'), exist_ok=True)
        os.makedirs(os.path.join(scene, 'pose'), exist_ok=True)
        with open(os.path.join(scene, 'intrinsics.txt'), 'w') as f:
            f.write(f'{focal:.6f} {args.size / 2:.6f} '
                    f'{args.size / 2:.6f} 0.\n')
            f.write('0. 0. 0.\n1.\n')
            f.write(f'{args.size} {args.size}\n')
        for v in range(args.views):
            pose = data['cond_poses'][s, v].astype(np.float64).copy()
            pose[:3, 3] *= 0.5  # scene frame -> raw SRN frame
            with open(os.path.join(scene, 'pose', f'{v:06d}.txt'),
                      'w') as f:
                f.write(' '.join(f'{x:.17g}' for x in pose.reshape(-1)))
                f.write('\n')
            img = (np.clip(data['cond_imgs'][s, v], 0, 1)
                   * 255).astype(np.uint8)
            cv2.imwrite(os.path.join(scene, 'rgb', f'{v:06d}.png'),
                        img[..., ::-1])  # RGB -> BGR for cv2
    print(f'wrote {args.scenes} scenes x {args.views} views '
          f'({args.size}x{args.size}) to {args.out_dir}')


if __name__ == '__main__':
    main()
