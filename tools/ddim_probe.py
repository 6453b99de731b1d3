#!/usr/bin/env python
"""DDIM sampler overhead attribution (VERDICT r4 #5).

Round-4 findings this probe established (v5e-1, flagship 8x18x128x128,
DDIM-50):

1. The round-3 "sampler overhead" was a measurement artifact: standalone
   single-dispatch UNet timings (tools/unet_probe.py, RTT-subtracted)
   under-report vs the honest in-scan rate.  Measured in a 50-step scan,
   the UNet-only bound is ~70 steps/s (f32) and the FULL sampler reaches
   99% of it — DDIM update math, clip_denoised and the per-step layout
   handling are all in the noise.
2. bf16-module sampling with an f32 param tree (what bench.py's round-3
   variant did) re-casts the whole UNet weight tree inside every scan
   step; the model's own _autocast (diffusion_nerf.py) pre-casts the
   tree once.  This probe measures both placements.

Reference being matched: the fp16 autocast sampler of
/root/reference/lib/models/autodecoders/diffusion_nerf.py:205-239.
"""
import os
import sys
import time
import dataclasses

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ssdnerf_tpu.core.timing import measure_rtt

RTT = measure_rtt()
jax.config.update('jax_compilation_cache_dir',
                  os.path.expanduser('~/.cache/jax_comp_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)

from ssdnerf_tpu.config import Config
from ssdnerf_tpu.registry import build_model

cfg = Config.fromfile(os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    'configs/paper_cfgs/ssdnerf_cars_uncond.py'))
tc = dict(cfg.train_cfg)
tc.pop('cache_load_from', None)
model = build_model(cfg.model, train_cfg=tc, test_cfg=dict(cfg.test_cfg))

key = jax.random.PRNGKey(0)
S = 8
diff_params = model.diffusion.init_params(key, batch=S)
noise = jax.random.normal(key, (S,) + model.code_size)
x0 = model.code_diff_pr(noise)
n_steps = int(model.test_cfg.get('num_timesteps', 50))


def timeit(fn, *args, tag=''):
    f = jax.jit(fn)
    float(f(*args))
    best = float('inf')
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(*args))
        best = min(best, time.perf_counter() - t0 - RTT)
    print(f'{tag:52s} {best * 1e3:8.1f} ms total '
          f'({n_steps / best:6.1f} steps/s)', flush=True)
    return best


def cast_tree(tree, dtype):
    return jax.tree_util.tree_map(
        lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a, tree)


variants = [
    ('f32', model.diffusion, diff_params, x0),
    ('bf16 module, f32 params (per-step cast)',
     dataclasses.replace(
         model.diffusion,
         denoising=model.diffusion.denoising.clone(dtype='bfloat16')),
     diff_params, x0),
    ('bf16 module, pre-cast params (_autocast)',
     dataclasses.replace(
         model.diffusion,
         denoising=model.diffusion.denoising.clone(dtype='bfloat16')),
     cast_tree(diff_params, jnp.bfloat16), x0.astype(jnp.bfloat16)),
]

for tag, diffusion, p, x in variants:
    # 1. full sampler
    def full(p, x, k, diffusion=diffusion):
        out, _ = diffusion.sample_from_noise(p, x, k, cfg=model.test_cfg)
        return jnp.asarray(out, jnp.float32).sum()
    timeit(full, p, x, jax.random.PRNGKey(1),
           tag=f'full DDIM sampler ({tag})')

    # 2. UNet-only NHWC scan: same 50 steps, x_prev = raw UNet output —
    # the in-scan throughput bound the sampler should match.
    def unet_only(p, x, diffusion=diffusion):
        def body(carry, t):
            h = diffusion._apply_unet(p, carry, jnp.full((S,), t, jnp.int32),
                                      nhwc=True)
            return h.astype(carry.dtype), ()
        out, _ = jax.lax.scan(body, jnp.transpose(x, (0, 2, 3, 1)),
                              jnp.arange(n_steps, dtype=jnp.int32))
        return jnp.asarray(out, jnp.float32).sum()
    timeit(unet_only, p, x, tag=f'UNet-only 50-step nhwc scan ({tag})')
