#!/usr/bin/env python
"""Quick renderer timing probe on real hardware (pallas vs xla backends).

Usage: python tools/perf_probe.py [pallas|xla] [n_rays_log2]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    backend = sys.argv[1] if len(sys.argv) > 1 else 'pallas'
    jax.config.update('jax_compilation_cache_dir',
                      os.path.expanduser('~/.cache/jax_comp_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)
    from ssdnerf_tpu.models import TriPlaneDecoder
    from ssdnerf_tpu.models.decoders.renderer import volume_render
    from ssdnerf_tpu.ops import get_cam_rays
    from ssdnerf_tpu.ops.morton import packbits
    from tests.synthetic import look_at_pose

    key = jax.random.PRNGKey(0)
    S = 8
    h = w = 128
    code = 0.5 * jax.random.normal(key, (S, 3, 6, 128, 128))
    mode = 'auto' if backend == 'pallas' else 'xla'
    dec = TriPlaneDecoder(backend=mode, compact_steps=64)
    params = dec.init(key, code[:1], jnp.zeros((1, 8, 3)),
                      jnp.zeros((1, 8, 3)))
    occ = jax.random.uniform(key, (S, 64 ** 3)) < 0.10
    bitfield = packbits(occ.astype(jnp.float32), 0.5)

    pose = look_at_pose(np.array([1.8, 0.6, 1.8]))
    poses = jnp.asarray(np.broadcast_to(pose, (S, 1, 4, 4)).copy())
    intr = jnp.asarray(np.broadcast_to(
        np.array([131.25, 131.25, 64., 64.], np.float32), (S, 1, 4)).copy())
    rays_o, rays_d = get_cam_rays(poses, intr, h, w)
    rays_o = rays_o.reshape(S, h * w, 3)
    rays_d = rays_d.reshape(S, h * w, 3)

    @jax.jit
    def render(code, rays_o, rays_d, bitfield):
        out = volume_render(dec, params, code, rays_o, rays_d, bitfield, 64,
                            dt_gamma=0.5 / 131.25, T_thresh=1e-4,
                            step_chunk=4)
        return out['image']

    t0 = time.perf_counter()
    img = render(code, rays_o, rays_d, bitfield)
    _ = float(img.sum())
    print(f'[{backend}] compile+first: {time.perf_counter()-t0:.1f}s')
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        img = render(code, rays_o, rays_d, bitfield)
        _ = float(img[0, 0, 0])
    dt = (time.perf_counter() - t0) / n
    print(f'[{backend}] {dt*1e3:.1f} ms/render, '
          f'{S*h*w/dt/1e6:.3f} Mrays/s')

    # training-shape probe: loss+grad through the renderer, 4096 rays
    nr = 4096
    ro, rd = rays_o[:, :nr], rays_d[:, :nr]
    tgt = jnp.zeros((S, nr, 3)) + 0.5

    @jax.jit
    def step(code, ro, rd, bitfield):
        def loss(code):
            out = volume_render(dec, params, code, ro, rd, bitfield, 64,
                                dt_gamma=0.5 / 131.25)
            img = out['image'] + (1 - out['weights_sum'][..., None])
            return jnp.mean((img - tgt) ** 2)
        return jax.grad(loss)(code)

    t0 = time.perf_counter()
    g = step(code, ro, rd, bitfield)
    _ = float(g.sum())
    print(f'[{backend}] train compile+first: {time.perf_counter()-t0:.1f}s')
    t0 = time.perf_counter()
    for _ in range(n):
        g = step(code, ro, rd, bitfield)
        _ = float(g[0, 0, 0, 0, 0])
    dt = (time.perf_counter() - t0) / n
    print(f'[{backend}] {dt*1e3:.1f} ms/grad-step (4096 rays), '
          f'{S*nr/dt/1e6:.3f} Mrays/s fwd+bwd')


if __name__ == '__main__':
    main()
