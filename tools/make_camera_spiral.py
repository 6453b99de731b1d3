#!/usr/bin/env python
"""Generate an SRN-format camera trajectory directory.

The reference ships fixed demo trajectories (``demo/camera_spiral_cars``:
``intrinsics.txt`` + ``pose/*.txt``) consumed by its GUI's ``--cameras``
flag (reference demo/ssdnerf_gui.py:21, lib/core/ssdnerf_gui.py:83-100).
This tool produces equivalent directories procedurally — a spiral orbit
with oscillating elevation around the object at the SRN camera radius —
so the TPU viewer's ``--cameras`` flag has data to point at without
shipping third-party files.

Usage:
    python tools/make_camera_spiral.py demo/camera_spiral \\
        [--frames 250] [--radius 1.3] [--elev 12 --elev-amp 18] \\
        [--focal 131.25] [--size 128]
"""
import argparse
import os

import numpy as np


def look_at(cam_pos, target=(0.0, 0.0, 0.0), up=(0.0, 0.0, 1.0)):
    """OpenCV-convention c2w: +z forward (toward target), +x right,
    +y down — the convention our dataset loader / get_cam_rays uses."""
    cam_pos = np.asarray(cam_pos, np.float64)
    fwd = np.asarray(target, np.float64) - cam_pos
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, np.asarray(up, np.float64))
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    c2w = np.eye(4)
    c2w[:3, 0] = right
    c2w[:3, 1] = down
    c2w[:3, 2] = fwd
    c2w[:3, 3] = cam_pos
    return c2w


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('out_dir')
    ap.add_argument('--frames', type=int, default=250)
    ap.add_argument('--radius', type=float, default=1.3,
                    help='camera distance in the raw SRN frame (the '
                         'dataset loader scales poses 2x into the unit '
                         'scene, matching SRN cars ~1.3)')
    ap.add_argument('--elev', type=float, default=12.0,
                    help='mean elevation (degrees)')
    ap.add_argument('--elev-amp', type=float, default=18.0,
                    help='elevation oscillation amplitude (degrees)')
    ap.add_argument('--turns', type=float, default=1.0,
                    help='azimuth revolutions over the trajectory')
    ap.add_argument('--focal', type=float, default=131.25)
    ap.add_argument('--size', type=int, default=128)
    args = ap.parse_args()

    pose_dir = os.path.join(args.out_dir, 'pose')
    os.makedirs(pose_dir, exist_ok=True)
    with open(os.path.join(args.out_dir, 'intrinsics.txt'), 'w') as f:
        f.write(f'{args.focal:.6f} {args.size / 2:.6f} '
                f'{args.size / 2:.6f} 0.\n')
        f.write('0. 0. 0.\n')
        f.write('1.\n')
        f.write(f'{args.size} {args.size}\n')

    for i in range(args.frames):
        t = i / args.frames
        az = 2 * np.pi * args.turns * t
        elev = np.radians(args.elev
                          + args.elev_amp * np.sin(2 * np.pi * t))
        pos = args.radius * np.array([
            np.cos(az) * np.cos(elev),
            np.sin(az) * np.cos(elev),
            np.sin(elev)])
        c2w = look_at(pos)
        with open(os.path.join(pose_dir, f'{i:06d}.txt'), 'w') as f:
            f.write(' '.join(f'{v:.17g}' for v in c2w.reshape(-1)))
            f.write('\n')
    print(f'wrote {args.frames} poses + intrinsics.txt to {args.out_dir}')


if __name__ == '__main__':
    main()
