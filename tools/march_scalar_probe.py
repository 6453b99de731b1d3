#!/usr/bin/env python
"""Adversarial probe of the revised 4.0e6-rays/s uniform bar (VERDICT r4 #9).

The bar's derivation says any *matmul* formulation of the byte-table
occupancy lookup costs >= table-size MACs per sample.  This probe
measures the obvious NON-matmul alternative on real hardware: a
scalar-core loop doing per-sample dynamic loads from an SMEM-resident
packed table (the TPU's only true random-access path).  Also times the
shipped int8 one-hot matmul kernel on identical inputs for the
per-sample cost comparison.

Result goes in PERF.md next to the bar derivation: either the scalar
path loses (bar survives with an experiment behind it) or the march
gets faster.

Usage: python tools/march_scalar_probe.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


H = 64
SUB = 1024


def _scalar_kernel(tab_ref, ji_ref, out_ref, *, n_sub):
    """Per-sample scalar loads: tab is (128, 64) i32 in SMEM (4 bytes per
    word, the (128, 256) byte table packed little-endian); ji rows are
    the packed sample indices.  The doubly-nested scalar loop is the
    point: this is what "just gather it" costs on a TPU core.

    Mosaic cannot store scalars to VMEM (per-sample f32 output is
    inexpressible from the scalar core — itself a finding), so the
    kernel reduces each sub to its occupied-sample POPCOUNT in an SMEM
    output; the per-sample memory-access cost being measured is
    identical."""

    def body_i(i, _):
        def body_j(j, acc):
            ji = ji_ref[i, j]
            live = ji >= 0
            jc = jnp.where(live, ji, 0)
            row = jc >> 11
            col = (jc >> 3) & 255
            zbit = jc & 7
            word = tab_ref[0, row, col >> 2]
            byte = (word >> ((col & 3) * 8)) & 255
            occ = (byte >> zbit) & 1
            return acc + jnp.where(live, occ, 0)

        out_ref[i, 0] = jax.lax.fori_loop(0, SUB, body_j, jnp.int32(0))
        return 0

    jax.lax.fori_loop(0, n_sub, body_i, 0)


def scalar_march(ji2, table_words, n_sub):
    """ji2: (n_chunks*n_sub, SUB) i32; table_words: (S, 128, 64) i32.
    Returns per-sub occupied-sample counts, (rows, 1) i32.

    Everything the scalar core touches must be SMEM (Mosaic: no scalar
    loads/stores on VMEM) — table, indices and output all stream through
    SMEM blocks."""
    S = table_words.shape[0]
    chunks = ji2.shape[0] // n_sub // S
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(S, chunks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM,
                         block_shape=(1, 128, 64),
                         index_map=lambda s, c: (s, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM,
                         block_shape=(n_sub, SUB),
                         index_map=lambda s, c: (s * chunks + c, 0)),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM,
                               block_shape=(n_sub, 1),
                               index_map=lambda s, c: (s * chunks + c, 0)),
        scratch_shapes=[],
    )
    return pl.pallas_call(
        functools.partial(_scalar_kernel, n_sub=n_sub),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ji2.shape[0], 1), jnp.int32),
    )(table_words, ji2)


def main():
    from ssdnerf_tpu.core.timing import measure_rtt
    from ssdnerf_tpu.ops.pallas.march import (occupancy_table,
                                              march_valid_mask)
    from ssdnerf_tpu.ops.morton import packbits

    rtt = measure_rtt()
    print(f'RTT {rtt * 1e3:.1f} ms', flush=True)
    rng = np.random.RandomState(0)
    S = 2
    R, T = 2048, 256           # a slice: 0.5M samples per scene
    occ = jnp.asarray(rng.rand(S, H ** 3) < 0.10, jnp.float32)
    bitfield = packbits(occ, 0.5)
    table = occupancy_table(bitfield, H)              # (S, 128, 256) i8
    # little-endian 4-byte packing into i32 words for SMEM
    tb = (np.asarray(table).astype(np.int32) + 128).astype(np.uint32)
    words = (tb.reshape(S, 128, 64, 4)
             * (1 << (8 * np.arange(4, dtype=np.uint32)))).sum(-1)
    words = jnp.asarray(words.astype(np.int32))

    ji = rng.randint(0, 2 ** 17, (S, R, T)).astype(np.int32)
    ji[rng.rand(*ji.shape) < 0.1] = -1                # some dead samples
    ji2 = jnp.asarray(ji.reshape(S * R * T // SUB, SUB))
    n_sub = 32

    # correctness vs a numpy oracle (per-sub popcounts)
    out = np.asarray(scalar_march(ji2, words, n_sub))[:, 0]
    jr = ji.reshape(-1, SUB)
    tab_np = np.asarray(table).astype(np.int32) + 128
    rows = jr.shape[0]
    s_of_row = np.arange(rows) // (R * T // SUB)
    live = jr >= 0
    jc = np.where(live, jr, 0)
    byte = tab_np[s_of_row[:, None], jc >> 11, (jc >> 3) & 255]
    ref = np.where(live, (byte >> (jc & 7)) & 1, 0).sum(-1)
    np.testing.assert_array_equal(out, ref.astype(np.int32))
    print('scalar kernel correct vs oracle', flush=True)

    def timeit(fn, *args, reps=3):
        jnp.sum(fn(*args)).block_until_ready() \
            if False else float(jnp.sum(fn(*args)))
        dt = float('inf')
        for _ in range(reps):
            t0 = time.perf_counter()
            float(jnp.sum(fn(*args)))
            dt = min(dt, time.perf_counter() - t0 - rtt)
        return dt

    f_scalar = jax.jit(lambda a, b: scalar_march(a, b, n_sub))
    dt_s = timeit(f_scalar, ji2, words)
    n_samples = S * R * T
    print(f'scalar-SMEM march: {dt_s * 1e3:8.2f} ms for {n_samples / 1e6:.2f}M '
          f'samples = {dt_s / n_samples * 1e9:.2f} ns/sample', flush=True)

    # the shipped matmul kernel on an equivalent sample count
    rays = np.zeros((S, R, 8), np.float32)
    rays[..., :3] = rng.uniform(-0.5, 0.5, (S, R, 3))
    d = rng.standard_normal((S, R, 3))
    rays[..., 3:6] = d / np.linalg.norm(d, axis=-1, keepdims=True)
    rays[..., 6] = 0.2
    rays[..., 7] = 3.0
    rays = jnp.asarray(rays)
    f_mm = jax.jit(functools.partial(
        march_valid_mask, T=T, grid_size=H, bound=1.0, max_steps=256))
    dt_m = timeit(f_mm, rays, table, jnp.full((S,), 0.01, jnp.float32))
    print(f'int8 matmul march: {dt_m * 1e3:8.2f} ms for {n_samples / 1e6:.2f}M '
          f'samples = {dt_m / n_samples * 1e9:.2f} ns/sample '
          f'(incl. t-grid + voxelize)', flush=True)
    print(f'scalar / matmul per-sample ratio: {dt_s / dt_m:.1f}x', flush=True)


if __name__ == '__main__':
    main()
