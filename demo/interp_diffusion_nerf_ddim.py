#!/usr/bin/env python
"""Noise-interpolation demo: sample a noise pair, interpolate (linear or
spherical-linear), decode every interpolant with DDIM and render it from
trajectory poses.

CLI mirror of the reference demo/interp_diffusion_nerf_ddim.py (which
feeds lib/apis/inference.py:interp_diffusion_nerf_ddim): renders each
interpolated scene at `--pose-ids` of an SRN-format `--cameras` directory
and writes `interp_XX_YY.png` files into `--viz-dir`.

Usage:
    python demo/interp_diffusion_nerf_ddim.py <config> <checkpoint> \\
        --viz-dir /tmp/interp --type spherical_linear --num-samples 10
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description='Interpolation demo')
    p.add_argument('config')
    p.add_argument('checkpoint', nargs='?', default=None)
    p.add_argument('--viz-dir', type=str, default='viz/interp')
    p.add_argument('--type', type=str, default='spherical_linear',
                   choices=['spherical_linear', 'linear'])
    p.add_argument('--cameras', type=str, default='demo/camera_spiral',
                   help='SRN-format trajectory dir for render poses')
    p.add_argument('--pose-ids', type=int, nargs='+', default=[64])
    p.add_argument('--seed', type=int, default=2021)
    p.add_argument('--num-samples', type=int, default=10)
    p.add_argument('--batchsize', type=int, default=10)
    p.add_argument('--fp16', action='store_true',
                   help='bf16 diffusion sampling on TPU')
    p.add_argument('--img-size', type=int, default=128)
    return p.parse_args()


def main():
    args = parse_args()
    import numpy as np
    import jax
    import jax.numpy as jnp
    from ssdnerf_tpu.apis.inference import init_model, interp_noise
    from ssdnerf_tpu.data.shapenet_srn import load_intrinsics, load_pose

    model, state = init_model(args.config, args.checkpoint,
                              use_fp16=args.fp16)

    pose_dir = os.path.join(args.cameras, 'pose')
    pose_files = sorted(os.listdir(pose_dir))
    poses = []
    for pid in args.pose_ids:
        pose = load_pose(os.path.join(pose_dir,
                                      pose_files[pid % len(pose_files)]))
        pose = np.asarray(pose, np.float32).copy()
        pose[:3, 3] *= 2.0  # SRN radius normalization
        poses.append(pose)
    poses = jnp.asarray(np.stack(poses))                  # (V, 4, 4)
    fx, fy, cx, cy, h, w = load_intrinsics(
        os.path.join(args.cameras, 'intrinsics.txt'))
    scale = args.img_size / h
    intr = jnp.asarray(
        np.array([fx * scale, fy * scale, cx * scale, cy * scale],
                 np.float32))
    V = poses.shape[0]

    key = jax.random.PRNGKey(args.seed)
    k_noise, k_sample = jax.random.split(key)
    endpoints = jax.random.normal(k_noise, (2,) + model.code_size)
    noise = interp_noise(endpoints, args.num_samples, args.type)

    os.makedirs(args.viz_dir, exist_ok=True)
    try:
        import imageio
    except ImportError:
        imageio = None

    sid = 0
    for start in range(0, args.num_samples, args.batchsize):
        nb = noise[start:start + args.batchsize]
        bs = nb.shape[0]
        code, _, bitfield = model.val_uncond(state, nb, k_sample)
        img, _ = model.render(
            state, code, bitfield, args.img_size, args.img_size,
            jnp.broadcast_to(intr, (bs, V, 4)),
            jnp.broadcast_to(poses[None], (bs, V, 4, 4)))
        img = np.clip(np.asarray(img), 0, 1)
        for b in range(bs):
            for v in range(V):
                name = f'interp_{sid:02d}_{args.pose_ids[v]:02d}.png'
                if imageio is not None:
                    imageio.imwrite(os.path.join(args.viz_dir, name),
                                    (img[b, v] * 255).astype(np.uint8))
                else:
                    np.save(os.path.join(args.viz_dir, name + '.npy'),
                            img[b, v])
            sid += 1
        print(f'decoded + rendered {sid}/{args.num_samples} interpolants',
              flush=True)
    print(f'wrote {sid * V} views to {args.viz_dir}')


if __name__ == '__main__':
    main()
