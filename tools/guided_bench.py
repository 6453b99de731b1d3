#!/usr/bin/env python
"""Benchmark + memory-budget the guided-reconstruction path (VERDICT r4 #5).

Runs `DiffusionNeRF.val_guide` — reconstruction-guided DDIM with
`jax.grad` THROUGH the UNet inside every sampler step (reference
/root/reference/lib/models/diffusions/gaussian_diffusion.py:180-240 +
diffusion_nerf.py:241-311) — at flagship recons1v shapes (128^2x18
codes, 128^2 cond view, 2^14 guide rays, 75 DDIM steps), with and
without the guide remat policy (`test_cfg.guide_remat`), and reports
guided steps/s plus the compiled peak-HBM analysis.

Usage: python tools/guided_bench.py [--batch 4] [--steps 75]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=4)
    ap.add_argument('--steps', type=int, default=None,
                    help='override DDIM step count (default: config, 75)')
    ap.add_argument('--remat', choices=['off', 'on', 'both'], default='both')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir',
                      os.path.expanduser('~/.cache/jax_comp_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)
    from ssdnerf_tpu.core.timing import measure_rtt
    from ssdnerf_tpu.config import Config
    from ssdnerf_tpu.registry import build_model
    from tests.synthetic import make_batch

    rtt = measure_rtt()
    print(f'[guided_bench] RTT {rtt * 1e3:.1f} ms', flush=True)

    cfg = Config.fromfile(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        'configs/paper_cfgs/ssdnerf_cars_recons1v.py'))
    tc = dict(cfg.train_cfg)
    tc.pop('cache_load_from', None)

    S = args.batch
    data_np = make_batch(num_scenes=S, num_views=1, h=128, w=128, seed=0)
    n_steps = args.steps or int(cfg.test_cfg['num_timesteps'])

    for remat in ([False, True] if args.remat == 'both'
                  else [args.remat == 'on']):
        test_cfg = dict(cfg.test_cfg, guide_remat=remat,
                        num_timesteps=n_steps)
        # override_cfg swaps EMA weight_scale at eval; irrelevant here
        test_cfg.pop('override_cfg', None)
        model = build_model(cfg.model, train_cfg=tc, test_cfg=test_cfg)
        key = jax.random.PRNGKey(0)
        state = model.init_state(
            key, dict(diffusion=dict(type='Adam', lr=1e-4),
                      decoder=dict(type='Adam', lr=1e-3)))
        data = {k: jnp.asarray(v) for k, v in data_np.items()
                if k != 'scene_name'}
        noise = jax.random.normal(key, (S,) + model.code_size)

        @jax.jit
        def guide(state, data, noise, k):
            code, grid, bitfield = model.val_guide(state, data, noise, k)
            return code.sum() + grid.sum()

        lowered = guide.lower(state, data, noise, key)
        compiled = lowered.compile()
        ma = compiled.memory_analysis()
        if ma is not None:
            print(f'[guided_bench] remat={remat}: peak HBM '
                  f'{(ma.temp_size_in_bytes + ma.argument_size_in_bytes) / 2 ** 30:.2f} GiB '
                  f'({ma.temp_size_in_bytes / 2 ** 30:.2f} temp + '
                  f'{ma.argument_size_in_bytes / 2 ** 30:.2f} args)',
                  flush=True)

        out = compiled(state, data, noise, key)
        float(out)  # force
        dt = float('inf')
        for _ in range(2):
            t0 = time.perf_counter()
            float(compiled(state, data, noise, key))
            dt = min(dt, time.perf_counter() - t0 - rtt)
        print(f'[guided_bench] remat={remat}: {n_steps / dt:.2f} guided '
              f'steps/s at batch {S} ({dt * 1e3:.0f} ms / {n_steps}-step '
              f'guided sample, 2^14 rays/guide)', flush=True)


if __name__ == '__main__':
    main()
