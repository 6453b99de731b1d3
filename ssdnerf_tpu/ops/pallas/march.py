"""Occupancy-grid march as a Pallas kernel (exact, gather-free).

Replaces the dense bitfield byte-gather of ops/marching.py (33.5M XLA
gathers at ~10 ns each for a full 128^2 render — the round-1 profile's
single largest cost) with an MXU formulation of the exact voxel test:

The Morton bitfield is reorganized once per render into a *byte table*
``G[y, x*8 + zb] = sum_j occ(x, y, zb*8+j) * 2^j`` (values 0..255 — exact
in bf16).  Per sample, a one-hot over the joint (x, zb) index turns the
table lookup into one (64, 512) @ (512, chunk) MXU matmul; the y row is
selected with a 64-row compare-mask-reduce and the z bit extracted with
exp2/floor arithmetic.  Everything stays in VMEM; the kernel reads only
per-ray data and writes one validity flag per sample.

Layout note: ALL per-sample quantities live as (1, chunk) / (rows, chunk)
arrays — samples in the 128-wide lane dimension — so every VPU op runs at
full lane utilization and kernel outputs are (rays, steps)-shaped (no
narrow trailing dims, which the TPU's (8, 128) HBM tiling would pad 128x).

Semantics match ``kernel_march_rays_train``'s occupancy test
(/root/reference/lib/ops/raymarching/src/raymarching.cu:311-492) exactly:
same t-recurrence (closed form), same voxel quantization, same Morton bit
order (converted losslessly by ``occupancy_table``).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..marching import SQRT3

SUB = 1024
SUBS_PER_CHUNK = 8


def march_supported(grid_size):
    return grid_size == 64


def occupancy_table(density_bitfield, grid_size=64):
    """Linear (x, y, z)-ordered bitfield -> byte table for the march kernel.

    With the internal linear voxel order, each bitfield byte already packs
    one z-octet; the table is a byte-level (x, y) transpose plus a bf16
    cast — no bit-level work.

    Args:
        density_bitfield: (..., grid_size**3 // 8) uint8, linear order
            (bit index = (x*H + y)*H + z).
    Returns:
        (..., grid_size, grid_size * 8) bf16 table T where
        ``T[..., y, x*8 + zb]`` packs occupancy bits z = zb*8 .. zb*8+7.
    """
    H = grid_size
    lead = density_bitfield.shape[:-1]
    bytes_ = density_bitfield.reshape(lead + (H, H, H // 8))  # (x, y, zb)
    bytes_ = jnp.swapaxes(bytes_, -3, -2)                     # (y, x, zb)
    return bytes_.reshape(lead + (H, H * 8)).astype(jnp.bfloat16)


def _t_closed_form(t0, k, g, dt_min, dt_max):
    """Closed-form marching recurrence (ops/marching.py:t_sequence)."""
    g = jnp.maximum(g, 0.0)
    g_safe = jnp.maximum(g, 1e-12)
    A = dt_min / g_safe
    B = dt_max / g_safe
    log1pg = jnp.log1p(g_safe)
    n1 = jnp.ceil(jnp.maximum(A - t0, 0.0) / dt_min)
    t1 = t0 + n1 * dt_min
    n2 = jnp.ceil(jnp.maximum(jnp.log(B / jnp.maximum(t1, 1e-12)), 0.0)
                  / log1pg)
    t2 = t1 * jnp.exp(n2 * log1pg)
    t_lin1 = t0 + k * dt_min
    t_geo = t1 * jnp.exp((k - n1) * log1pg)
    t_lin2 = t2 + (k - n1 - n2) * dt_max
    ts = jnp.where(k < n1, t_lin1, jnp.where(k < n1 + n2, t_geo, t_lin2))
    return jnp.where(g > 0, ts, t_lin1)


def _march_kernel(rays_ref, gt_ref, dg_ref, out_ref, *, T, H, bound,
                  dt_min, dt_max, chunk, sub):
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    rays_per_sub = sub // T
    n_sub = chunk // sub
    mip_bound = min(1.0, float(bound))
    gamma = dg_ref[pl.program_id(0), 0]

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, sub), 1)
    k = (lane % T).astype(f32)
    ridx = lane // T
    row512 = jax.lax.broadcasted_iota(jnp.int32, (H * 8, sub), 0)
    row64 = jax.lax.broadcasted_iota(jnp.int32, (H, sub), 0).astype(f32)
    gt = gt_ref[0].astype(bf16)                           # (H, H*8)

    for s_i in range(n_sub):
        row0 = s_i * rays_per_sub
        # broadcast per-ray packed values to samples (samples in lanes)
        q = [jnp.zeros((1, sub), f32) for _ in range(8)]
        for r in range(rays_per_sub):
            m = (ridx == r).astype(f32)
            for j in range(8):
                q[j] = q[j] + m * rays_ref[row0 + r, j]
        ox, oy, oz, dx, dy, dz, t0, far = q
        t = _t_closed_form(t0, k, gamma, dt_min, dt_max)
        x = jnp.clip(ox + t * dx, -bound, bound)
        y = jnp.clip(oy + t * dy, -bound, bound)
        z = jnp.clip(oz + t * dz, -bound, bound)
        scale = 0.5 * H / mip_bound

        def vox(c):
            return jnp.clip(jnp.floor((c + mip_bound) * scale), 0.0, H - 1.0)

        ix, iy, iz = vox(x), vox(y), vox(z)
        izb = jnp.floor(iz / 8.0)
        jbit = iz - izb * 8.0
        # joint one-hot over (x, zb): row index x*8 + zb
        xzb = (ix * 8.0 + izb).astype(jnp.int32)
        onehot = (row512 == xzb).astype(bf16)              # (512, sub)
        U = jax.lax.dot_general(gt, onehot, (((1,), (0,)), ((), ())),
                                preferred_element_type=f32)  # (64, sub)
        sel = (row64 == iy).astype(f32)
        byte = jnp.sum(U * sel, axis=0, keepdims=True)     # (1, sub)
        shifted = jnp.floor(byte * jnp.exp2(-jbit))
        occ = shifted - 2.0 * jnp.floor(shifted * 0.5)
        valid = occ * (t < far).astype(f32)
        out_ref[s_i:s_i + 1, :] = valid


def march_valid_mask(rays_pack, table, dt_gamma, *, T, grid_size, bound,
                     max_steps, interpret=False):
    """Exact per-sample occupancy validity, Pallas-fused.

    Args:
        rays_pack: (S, R, 8) f32 rows [ox oy oz dx dy dz t0 far]; ``t0``
            already includes the perturb jitter, ``far`` the AABB far clip.
        table: (S, grid_size, grid_size*8) bf16 from :func:`occupancy_table`.
        dt_gamma: (S,) f32 cone-stepping factors.
        T: static samples per ray (num_slots); must divide 1024.
        max_steps: static int setting the dt scale.

    Returns:
        (S, R, T) f32 validity in {0, 1}.
    """
    S, R, _ = rays_pack.shape
    H = grid_size
    N = R * T
    dt_min = 2.0 * SQRT3 / max_steps
    dt_max = 2.0 * SQRT3 / H
    assert SUB % T == 0, (T,)

    chunk = SUB * SUBS_PER_CHUNK
    while N % chunk != 0 and chunk > SUB:
        chunk //= 2
    chunk = min(chunk, N)
    assert N % chunk == 0, (N, chunk)
    sub = SUB
    rays_per_chunk = chunk // T
    Cg = N // chunk
    rays_f = rays_pack.reshape(S * R, 8)
    dg = dt_gamma.reshape(S, 1).astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(_march_kernel, T=T, H=H, bound=float(bound),
                          dt_min=dt_min, dt_max=dt_max, chunk=chunk, sub=sub),
        grid=(S, Cg),
        in_specs=[
            pl.BlockSpec((rays_per_chunk, 8), lambda s, c: (s * Cg + c, 0)),
            pl.BlockSpec((1, H, H * 8), lambda s, c: (s, 0, 0)),
            pl.BlockSpec((S, 1), lambda s, c: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((chunk // SUB, SUB),
                               lambda s, c: (s * Cg + c, 0)),
        out_shape=jax.ShapeDtypeStruct((S * N // SUB, SUB), jnp.float32),
        interpret=interpret,
    )(rays_f, table, dg)
    return out.reshape(S, R, T)
