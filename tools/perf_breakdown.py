#!/usr/bin/env python
"""Stage-by-stage timing of the fused renderer on real hardware."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, n=10, tag=''):
    out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _i in range(n):
        out = fn(*args)
        _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    dt = (time.perf_counter() - t0) / n
    print(f'{tag}: {dt*1e3:.1f} ms')
    return out


def main():
    jax.config.update('jax_compilation_cache_dir',
                      os.path.expanduser('~/.cache/jax_comp_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)
    from ssdnerf_tpu.models import TriPlaneDecoder
    from ssdnerf_tpu.models.decoders.renderer import _decode_fused
    from ssdnerf_tpu.ops import get_cam_rays, near_far_from_aabb, composite_rays
    from ssdnerf_tpu.ops.morton import packbits
    from ssdnerf_tpu.ops.marching import SQRT3, compact_samples, t_at_step
    from ssdnerf_tpu.ops import pallas as pallas_ops
    from tests.synthetic import look_at_pose

    key = jax.random.PRNGKey(0)
    S, h, w, T, K, H = 8, 128, 128, 256, 64, 64
    N = h * w
    code = 0.5 * jax.random.normal(key, (S, 3, 6, 128, 128))
    dec = TriPlaneDecoder(backend='auto', compact_steps=K)
    params = dec.init(key, code[:1], jnp.zeros((1, 8, 3)),
                      jnp.zeros((1, 8, 3)))
    occ = jax.random.uniform(key, (S, H ** 3)) < 0.10
    bitfield = packbits(occ.astype(jnp.float32), 0.5)

    pose = look_at_pose(np.array([1.8, 0.6, 1.8]))
    poses = jnp.asarray(np.broadcast_to(pose, (S, 1, 4, 4)).copy())
    intr = jnp.asarray(np.broadcast_to(
        np.array([131.25, 131.25, 64., 64.], np.float32), (S, 1, 4)).copy())
    rays_o, rays_d = get_cam_rays(poses, intr, h, w)
    rays_o = rays_o.reshape(S, N, 3)
    rays_d = rays_d.reshape(S, N, 3)
    dt_gamma = jnp.full((S,), 0.5 / 131.25)
    dt_min = 2.0 * SQRT3 / T
    dt_max = 2.0 * SQRT3 / H

    tab = timeit(jax.jit(lambda b: pallas_ops.occupancy_table(b, H)),
                 bitfield, tag='occupancy_table')

    aabb = jnp.array([-1.0] * 3 + [1.0] * 3, jnp.float32)
    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, 0.2)
    t0v = nears

    @jax.jit
    def march(rays_o, rays_d, t0v, fars, tab, dt_gamma):
        pack = jnp.concatenate(
            [rays_o, rays_d, t0v[..., None], fars[..., None]], axis=-1)
        return pallas_ops.march_valid_mask(
            pack, tab, dt_gamma, T=T, grid_size=H, bound=1.0, max_steps=T)

    valid = timeit(march, rays_o, rays_d, t0v, fars, tab, dt_gamma,
                   tag='march kernel')

    @jax.jit
    def compact(valid, t0v, dt_gamma):
        v = valid > 0.5
        comp_step, comp_valid = compact_samples(v, K)
        dtg = dt_gamma[:, None, None]
        comp_ts = t_at_step(t0v, comp_step, dtg, dt_min, dt_max)
        comp_dts = jnp.clip(comp_ts * dtg, dt_min, dt_max)
        return comp_ts, comp_dts, comp_valid

    comp_ts, comp_dts, comp_valid = timeit(compact, valid, t0v, dt_gamma,
                                           tag='compact+t')

    @jax.jit
    def decode(code, comp_ts, rays_o, rays_d):
        xyz = jnp.clip(
            rays_o[:, :, None, :] + comp_ts[..., None] * rays_d[:, :, None, :],
            -1.0, 1.0)
        return _decode_fused(dec, params, code, xyz, rays_d, K, False)

    sig, rgb = timeit(decode, code, comp_ts, rays_o, rays_d,
                      tag='decode kernel (+xyz prep)')

    @jax.jit
    def comp(sig, rgb, comp_dts, comp_ts, comp_valid):
        return composite_rays(sig, rgb, comp_dts, comp_ts, comp_valid, 1e-4)

    timeit(comp, sig, rgb, comp_dts, comp_ts, comp_valid, tag='composite')

    frac = float(jnp.mean(valid))
    print(f'valid fraction: {frac:.3f}')


if __name__ == '__main__':
    main()
