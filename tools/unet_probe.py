#!/usr/bin/env python
"""Per-component timing of the flagship denoising UNet (VERDICT r4 #5).

Times the full forward at batch 8 (the DDIM bench shape) and the
individual building blocks at every level's shapes — 3x3 convs (f32 /
bf16 / NCHW), GroupNorm, attention — so the DDIM steps/s gap can be
attributed to a component instead of a guess.

Usage: python tools/unet_probe.py [--full-only]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ssdnerf_tpu.core.timing import measure_rtt

RTT = measure_rtt()
N_IT = 10


def timeit(fn, *args, tag='', n=N_IT):
    """n must put the loop's wall-clock far above the ~25 ms RTT jitter:
    sub-ms kernels need hundreds of iterations or the subtraction goes
    negative (first probe run of round 4 — all per-level rows were
    noise at n=10)."""
    @jax.jit
    def run(eps, *args):
        def body(i, acc):
            out = fn(eps * i, *args)
            return acc + jnp.sum(out) * 1e-30
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    z = jnp.float32(0.0)
    float(run(z, *args))
    dt = float('inf')
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(z, *args))
        dt = min(dt, (time.perf_counter() - t0 - RTT) / n)
    print(f'{tag:46s} {dt * 1e3:8.3f} ms', flush=True)
    return dt


def conv_taps(x, w, b):
    """3x3 'same' conv as 9 shifted (B*H*W, Cin)@(Cin, Cout) matmuls.

    Candidate lowering for the VERDICT r4 #5 conv matrix: no im2col
    materialization, every tap is a full-width MXU matmul, and XLA can
    fuse the pad/slice shifts into the operand reads.  w: (3, 3, Cin,
    Cout) in HWIO (the flax kernel layout)."""
    B, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = None
    for dy in range(3):
        for dx in range(3):
            tap = jax.lax.dynamic_slice(xp, (0, dy, dx, 0), (B, H, W, C))
            y = jnp.einsum('bhwc,cd->bhwd', tap, w[dy, dx])
            out = y if out is None else out + y
    return out + b


def variants(key, B=8):
    """Measured matrix of conv lowerings at the two largest UNet levels."""
    for res, cin, cout in ((128, 18, 128), (128, 128, 128),
                           (128, 256, 128), (64, 384, 256),
                           (64, 512, 256)):
        flops = 2 * B * res * res * 9 * cin * cout
        x = jax.random.normal(key, (B, res, res, cin))
        for dtype in (jnp.float32, jnp.bfloat16):
            name = jnp.dtype(dtype).name
            conv = nn.Conv(cout, (3, 3), padding=1, dtype=dtype)
            p = jax.jit(conv.init)(key, x)
            peak = 197e12 if dtype == jnp.bfloat16 else 99e12

            dt = timeit(lambda eps, p, x: conv.apply(p, x + eps), p, x,
                        tag=f'native NHWC {res}^2 {cin}->{cout} {name}',
                        n=400)
            print(f'  -> {flops / dt / peak * 100:5.1f}% of MXU peak',
                  flush=True)

            # 9-tap shifted-matmul lowering
            w = p['params']['kernel'].astype(dtype)
            bb = p['params']['bias'].astype(dtype)
            dt = timeit(lambda eps, w, bb, x: conv_taps(
                (x + eps).astype(dtype), w, bb), w, bb, x,
                tag=f'9-tap matmul {res}^2 {cin}->{cout} {name}', n=400)
            print(f'  -> {flops / dt / peak * 100:5.1f}% of MXU peak',
                  flush=True)

            # NCHW lowering (feature-major): XLA transposes or re-tiles
            xn = jnp.moveaxis(x, -1, 1)

            def nchw(eps, w, bb, xn):
                y = jax.lax.conv_general_dilated(
                    (xn + eps).astype(dtype), w.astype(dtype),
                    (1, 1), 'SAME',
                    dimension_numbers=('NCHW', 'HWIO', 'NCHW'))
                return y + bb[None, :, None, None]

            dt = timeit(nchw, w, bb, xn,
                        tag=f'native NCHW {res}^2 {cin}->{cout} {name}',
                        n=400)
            print(f'  -> {flops / dt / peak * 100:5.1f}% of MXU peak',
                  flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--full-only', action='store_true')
    ap.add_argument('--skip-full', action='store_true')
    ap.add_argument('--variants', action='store_true',
                    help='conv-lowering matrix at the two largest levels')
    args = ap.parse_args()
    jax.config.update('jax_compilation_cache_dir',
                      os.path.expanduser('~/.cache/jax_comp_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)

    from ssdnerf_tpu.models.architecture.unet import DenoisingUnet
    B = 8
    key = jax.random.PRNGKey(0)

    if args.variants:
        variants(key, B)
        return

    if not args.skip_full:
        for dtype in ('float32', 'bfloat16'):
            net = DenoisingUnet(dtype=dtype)
            x = jax.random.normal(key, (B, 128, 128, 18))
            t = jnp.full((B,), 500, jnp.int32)
            params = jax.jit(net.init)(key, x, t)
            dt = timeit(lambda eps, p, x, t: net.apply(p, x + eps, t),
                        params, x, t, tag=f'full UNet fwd ({dtype})', n=100)
            print(f'  -> {1.0 / dt:.1f} fwd/s = DDIM-step rate bound',
                  flush=True)
    if args.full_only:
        return

    # per-level conv shapes: (res, C_in, C_out); skip-concat inputs in dec
    shapes = [
        (128, 18, 128), (128, 128, 128), (128, 256, 128),
        (64, 128, 256), (64, 256, 256), (64, 384, 256), (64, 512, 256),
        (32, 256, 256), (32, 512, 256),
        (16, 256, 512), (16, 512, 512), (16, 768, 512), (16, 1024, 512),
        (8, 512, 512), (8, 1024, 512),
    ]
    for res, cin, cout in shapes:
        x = jax.random.normal(key, (B, res, res, cin))
        flops = 2 * B * res * res * 9 * cin * cout
        for dtype in (jnp.float32, jnp.bfloat16):
            conv = nn.Conv(cout, (3, 3), padding=1, dtype=dtype)
            p = jax.jit(conv.init)(key, x)
            dt = timeit(lambda eps, p, x: conv.apply(p, x + eps), p, x,
                        tag=f'conv3x3 {res}^2 {cin}->{cout} '
                            f'{jnp.dtype(dtype).name}', n=400)
            eff = flops / dt / (197e12 if dtype == jnp.bfloat16 else 99e12)
            print(f'  -> {eff * 100:5.1f}% of MXU peak', flush=True)

            # fwd+bwd (dgrad + wgrad): the train step's actual shape
            def vag(eps, p, x):
                def f(p, x):
                    return jnp.sum(conv.apply(p, x + eps) ** 2)
                g_p, g_x = jax.grad(f, argnums=(0, 1))(p, x)
                return g_x + g_p['params']['kernel'].sum() * 1e-30

            dtb = timeit(vag, p, x,
                         tag=f'  +bwd {res}^2 {cin}->{cout} '
                             f'{jnp.dtype(dtype).name}', n=200)
            effb = 3 * flops / dtb / (197e12 if dtype == jnp.bfloat16
                                      else 99e12)
            print(f'  -> fwd+bwd {effb * 100:5.1f}% of MXU peak '
                  f'(bwd/fwd {dtb / dt - 1:.2f}x)', flush=True)

    # GroupNorm + SiLU at the big levels (HBM-bound candidates)
    for res, c in ((128, 128), (128, 256), (64, 256), (64, 512)):
        x = jax.random.normal(key, (B, res, res, c))
        gn = nn.GroupNorm(num_groups=32)
        p = jax.jit(gn.init)(key, x)
        dt = timeit(lambda eps, p, x: jax.nn.silu(gn.apply(p, x + eps)),
                    p, x, tag=f'GN+SiLU {res}^2 c={c}', n=400)
        gb = 2 * x.size * 4 / 1e9
        print(f'  -> {gb / dt:.0f} GB/s effective', flush=True)

    # attention at its levels
    from ssdnerf_tpu.models.architecture.unet import SelfAttention
    for res, c in ((32, 256), (16, 512), (8, 512)):
        x = jax.random.normal(key, (B, res, res, c))
        at = SelfAttention(4, 1, 32)
        p = jax.jit(at.init)(key, x)
        timeit(lambda eps, p, x: at.apply(p, x + eps), p, x,
               tag=f'attention {res}^2 c={c}', n=400)


if __name__ == '__main__':
    main()
