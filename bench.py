#!/usr/bin/env python
"""Benchmark: volumetric rendering throughput on the flagship model.

Measures rays/sec for a full 128x128 render batch through the TPU-native
pipeline (march -> triplane decode -> composite) with the flagship
cars_uncond decoder and a realistically sparse occupancy bitfield, plus
DDIM UNet steps/sec as a secondary statistic (printed to stderr).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is relative to BASELINE.json's north-star A100-class
reference renderer throughput of 1e7 rays/sec (the reference publishes no
throughput numbers, BASELINE.md "Not published by the reference").
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_RAYS_PER_SEC = 1.0e7


def main():
    import numpy as np
    import jax
    try:  # persistent compile cache (first compile is minutes on TPU)
        jax.config.update('jax_compilation_cache_dir',
                          os.path.expanduser('~/.cache/jax_comp_cache'))
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)
    except Exception:
        pass
    import jax.numpy as jnp
    from ssdnerf_tpu.config import Config
    from ssdnerf_tpu.registry import build_model
    from ssdnerf_tpu.models.decoders.renderer import volume_render
    from ssdnerf_tpu.ops import get_cam_rays
    from tests.synthetic import look_at_pose

    cfg = Config.fromfile(os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        'configs/paper_cfgs/ssdnerf_cars_uncond.py'))
    tc = dict(cfg.train_cfg)
    tc.pop('cache_load_from', None)
    model = build_model(cfg.model, train_cfg=tc, test_cfg=dict(cfg.test_cfg))

    key = jax.random.PRNGKey(0)
    S = 8
    h = w = 128
    code = 0.5 * jax.random.normal(key, (S,) + model.code_size)
    params = model.decoder.init(
        key, code[:1], jnp.zeros((1, 8, 3)), jnp.zeros((1, 8, 3)))

    # ~10% occupancy bitfield (mid-training realism)
    occ = jax.random.uniform(key, (S, model.grid_size ** 3)) < 0.10
    from ssdnerf_tpu.ops.morton import packbits
    bitfield = packbits(occ.astype(jnp.float32), 0.5)

    pose = look_at_pose(np.array([1.8, 0.6, 1.8]))
    poses = jnp.asarray(np.broadcast_to(pose, (S, 1, 4, 4)).copy())
    intr = jnp.asarray(np.broadcast_to(
        np.array([131.25, 131.25, 64., 64.], np.float32), (S, 1, 4)).copy())
    rays_o, rays_d = get_cam_rays(poses, intr, h, w)
    rays_o = rays_o.reshape(S, h * w, 3)
    rays_d = rays_d.reshape(S, h * w, 3)

    def render_sum(code, rays_o, rays_d, bitfield):
        out = volume_render(model.decoder, params, code, rays_o, rays_d,
                            bitfield, model.grid_size,
                            dt_gamma=0.5 / 131.25, T_thresh=1e-4,
                            step_chunk=4)
        return out['image'].sum()

    # The axon remote backend adds ~30 ms RTT per dispatch+readback and
    # block_until_ready does not reliably block on it, so time `n_iters`
    # sequential renders inside ONE jit (fori_loop carry serializes them;
    # the eps*i input perturbation defeats loop-invariant hoisting) and do
    # a single 8-byte readback.
    n_iters = 10

    @jax.jit
    def run(eps, code, rays_o, rays_d, bitfield):
        def body(i, acc):
            return acc + render_sum(code + eps * i, rays_o, rays_d, bitfield)
        return jax.lax.fori_loop(0, n_iters, body, jnp.float32(0.0))

    z = jnp.float32(0.0)
    _ = float(run(z, code, rays_o, rays_d, bitfield))
    dt = float('inf')
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(run(z, code, rays_o, rays_d, bitfield))
        dt = min(dt, (time.perf_counter() - t0 - 0.030) / n_iters)
    total_rays = S * h * w
    rays_per_sec = total_rays / dt

    # secondary: FULL DDIM sampler scan (50 steps, batch 8, 18x128x128),
    # f32 and bf16-autocast variants (stderr only)
    try:
        diff_params = model.diffusion.init_params(key, batch=S)
        noise = jax.random.normal(key, (S,) + model.code_size)
        n_steps = int(model.test_cfg.get('num_timesteps', 50))

        def run_variant(autocast):
            p = diff_params
            x = model.code_diff_pr(noise)
            if autocast:
                from ssdnerf_tpu.models.autodecoders.diffusion_nerf import \
                    _cast_tree
                p = _cast_tree(p, jnp.bfloat16)
                x = x.astype(jnp.bfloat16)

            @jax.jit
            def sample(p, x, k):
                out, _ = model.diffusion.sample_from_noise(
                    p, x, k, cfg=model.test_cfg)
                return jnp.asarray(out, jnp.float32).sum()

            k = jax.random.PRNGKey(1)
            _ = float(sample(p, x, k))
            dt = float('inf')
            n_rep = 3
            for _i in range(n_rep):
                t0 = time.perf_counter()
                _ = float(sample(p, x, k))
                dt = min(dt, time.perf_counter() - t0 - 0.030)
            tag = 'bf16' if autocast else 'f32'
            print(f'[bench] ddim full sampler ({tag}): '
                  f'{n_steps / dt:.1f} steps/s at batch {S} '
                  f'({dt * 1e3:.0f} ms / {n_steps}-step sample)',
                  file=sys.stderr)

        run_variant(False)
        run_variant(True)
    except Exception as e:  # secondary stat must never break the bench
        print(f'[bench] ddim bench skipped: {e}', file=sys.stderr)

    print(json.dumps({
        'metric': 'render_rays_per_sec_128res',
        'value': round(rays_per_sec, 1),
        'unit': 'rays/s',
        'vs_baseline': round(rays_per_sec / BASELINE_RAYS_PER_SEC, 4),
    }))


if __name__ == '__main__':
    main()
