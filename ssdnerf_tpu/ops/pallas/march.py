"""Occupancy-grid march as a Pallas kernel (exact, gather-free).

Replaces the dense bitfield byte-gather of ops/marching.py (33.5M XLA
gathers at ~10 ns each for a full 128^2 render — the round-1 profile's
single largest cost) with an MXU formulation of the exact voxel test:

The bitfield is reorganized once per render into a *byte table*: bytes
``B[flat] = sum_j occ(x, y, zb*8+j) * 2^j`` with ``flat = y*512 + x*8 +
zb`` (values 0..255), stored int8 with a -128 offset and reshaped
``(128, 256)`` — ``T2[flat >> 8, flat & 255]``.  Per sample, a one-hot
over the low 8 index bits turns the lookup into one (128, 256) @
(256, chunk) MXU matmul; the high 7 bits select the output row with a
compare-mask-reduce and the z bit is extracted with exp2/floor arithmetic.

v3 (this file) over v2: the v2 table was (64, 512) — an M=64-row matmul
runs the MXU at 50% row utilization (PERF.md).  Folding one x bit into the
row index gives the MXU-native (128, 256) shape: full utilization, 2x.
On top, int8 operands (the -128 offset keeps bytes exact in int8; the
one-hot is 0/1) double the MXU rate again on v5e vs bf16.  The f32
accumulate of v2 was exact for bytes; the i32 accumulate of v3 trivially
so.

Division of labor (v2, unchanged): everything *per-ray* and
*per-sample-scalar* — the closed-form t grid, ray positions, voxel
quantization, far clip — runs in XLA, fused and fully dense, and reaches
the kernel as ONE packed int32 per sample (``(iy<<12)|(ix<<6)|(izb<<3)|
izlow``, negative = past far).  The kernel does only what XLA cannot: the
gather, expressed as one-hot MXU matmuls.  (The v1 kernel recomputed
t/coords in-kernel from per-ray SMEM rows; profiling showed those
(1, 1024)-shaped VPU ops run at 1/8 sublane utilization and cost 4x the
occupancy matmul itself.)

Semantics match ``kernel_march_rays_train``'s occupancy test
(/root/reference/lib/ops/raymarching/src/raymarching.cu:311-492): same
t-recurrence (closed form, shared with the XLA path's ``t_at_step``, so
fused and fallback paths agree bit-for-bit), same voxel quantization,
same linear bit order (converted losslessly by ``occupancy_table``).
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..marching import SQRT3, t_at_step

SUB = 1024
SUBS_PER_CHUNK = 32


def march_supported(grid_size):
    return grid_size == 64


def occupancy_table(density_bitfield, grid_size=64):
    """Linear (x, y, z)-ordered bitfield -> int8 byte table for the kernel.

    With the internal linear voxel order, each bitfield byte already packs
    one z-octet; the table is a byte-level (x, y) transpose, a -128 offset
    (so 0..255 is exact in int8) and an MXU-native (128, 256) reshape.

    Args:
        density_bitfield: (..., grid_size**3 // 8) uint8, linear order
            (bit index = (x*H + y)*H + z).
    Returns:
        (..., 2*grid_size, 4*grid_size) int8 table T2 where, with
        ``flat = y*(8H) + x*8 + zb``, ``T2[..., flat >> 8, flat & 255] =
        byte(x, y, zb) - 128`` packing occupancy bits z = zb*8 .. zb*8+7.
    """
    H = grid_size
    lead = density_bitfield.shape[:-1]
    bytes_ = density_bitfield.reshape(lead + (H, H, H // 8))  # (x, y, zb)
    bytes_ = jnp.swapaxes(bytes_, -3, -2)                     # (y, x, zb)
    off = (bytes_.astype(jnp.int32) - 128).astype(jnp.int8)
    return off.reshape(lead + (2 * H, 4 * H))


def _march_kernel(live_ref, ji_ref, gt_ref, out_ref, col_ref, row_ref, *,
                  H, n_sub, sub, int8_dot, Cg):
    f32 = jnp.float32
    s = pl.program_id(0)
    c = pl.program_id(1)
    row256 = jax.lax.broadcasted_iota(jnp.int32, (4 * H, sub), 0)
    row128 = jax.lax.broadcasted_iota(jnp.int32, (2 * H, sub), 0)
    if int8_dot:
        gt = gt_ref[0]                                    # (128, 256) i8
    else:
        gt = gt_ref[0].astype(jnp.bfloat16)

    # dense unpack of the packed per-sample indices (through scratch refs
    # so the per-sub loop can dynamic-slice rows)
    ji = ji_ref[...]                                      # (n_sub, sub) i32
    live = ji >= 0
    jc = jnp.where(live, ji, 0)
    row_ref[...] = jc >> 11
    col_ref[...] = (jc >> 3) & (4 * H - 1)
    jbit = (jc & 7).astype(f32)

    def body(i, _):
        # all-dead subs (ray tails past far, rays missing the scene /
        # occupied AABB) skip the table matmul entirely — the epilogue's
        # `where(live, ...)` zeroes their lanes whatever out_ref holds.
        # Saves ~whole-sub MXU+VPU work on pruned scenes where many rays
        # miss the occupied box (raymarching.cu's early `return` rays).
        @pl.when(live_ref[(s * Cg + c) * n_sub + i] > 0)
        def _do():
            _march_sub(i)
        return 0

    def _march_sub(i):
        ohm = row256 == col_ref[pl.ds(i, 1), :]
        if int8_dot:
            oh = ohm.astype(jnp.int8)                     # (256, sub)
            U = jax.lax.dot_general(gt, oh, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            selm = row128 == row_ref[pl.ds(i, 1), :]
            # where-select measured ~1.5% over mask-multiply; the kernel
            # is VPU-bound on the i32 one-hot build + select, and v5e has
            # no packed-i8 vector compares (measured: Mosaic "Target does
            # not support this comparison" on vector<8x128x4xi8>), so an
            # i8 build is impossible — this is the practical floor
            b = jnp.sum(jnp.where(selm, U, 0), axis=0, keepdims=True)
            out_ref[pl.ds(i, 1), :] = b.astype(f32) + 128.0
        else:
            oh = ohm.astype(jnp.bfloat16)
            U = jax.lax.dot_general(gt, oh, (((1,), (0,)), ((), ())),
                                    preferred_element_type=f32)
            sel = (row128 == row_ref[pl.ds(i, 1), :]).astype(f32)
            b = jnp.sum(U * sel, axis=0, keepdims=True)
            out_ref[pl.ds(i, 1), :] = b + 128.0

    jax.lax.fori_loop(0, n_sub, body, 0)

    # dense bit extraction from the gathered bytes
    byte = out_ref[...]                                   # (n_sub, sub) f32
    shifted = jnp.floor(byte * jnp.exp2(-jbit))
    occ = shifted - 2.0 * jnp.floor(shifted * 0.5)
    out_ref[...] = jnp.where(live, occ, 0.0)


def march_valid_mask(rays_pack, table, dt_gamma, *, T, grid_size, bound,
                     max_steps, interpret=False, int8_dot=True):
    """Exact per-sample occupancy validity, Pallas-fused.

    Args:
        rays_pack: (S, R, 8) f32 rows [ox oy oz dx dy dz t0 far]; ``t0``
            already includes the perturb jitter, ``far`` the AABB far clip.
        table: (S, 2*grid_size, 4*grid_size) int8 from
            :func:`occupancy_table`.
        dt_gamma: (S,) f32 cone-stepping factors.
        T: static samples per ray (num_slots); must divide 1024.
        max_steps: static int setting the dt scale.
        int8_dot: use the int8 MXU path (2x bf16 rate); the bf16 fallback
            computes the identical result.

    Returns:
        (S, R, T) f32 validity in {0, 1}.
    """
    S, R, _ = rays_pack.shape
    H = grid_size
    N = R * T
    dt_min = 2.0 * SQRT3 / max_steps
    dt_max = 2.0 * SQRT3 / H
    assert SUB % T == 0 or T % SUB == 0, (T,)
    mip_bound = min(1.0, float(bound))

    dt_gamma = jnp.broadcast_to(jnp.asarray(dt_gamma, jnp.float32), (S,))
    t0 = rays_pack[..., 6]
    far = rays_pack[..., 7]
    k = jnp.arange(T, dtype=jnp.float32)
    t = t_at_step(t0, k, dt_gamma[:, None, None],
                  dt_min, dt_max)                          # (S, R, T)

    # voxelization written exactly as in ops/marching.py:march_rays so the
    # fused and XLA paths agree bit-for-bit; per-component (S, R, T) arrays
    # (a trailing xyz dim of 3 would get 42x lane padding under the TPU's
    # (8, 128) tiling)
    def voxel(c):
        x = jnp.clip(rays_pack[..., None, c] + t * rays_pack[..., None, 3 + c],
                     -bound, bound)
        return jnp.clip((0.5 * (x / mip_bound + 1.0) * H).astype(jnp.int32),
                        0, H - 1)

    ix, iy, iz = voxel(0), voxel(1), voxel(2)
    # flat byte-table index (iy*8H + ix*8 + izb) in bits [17:3], z bit in
    # [2:0]; matches occupancy_table's (128, 256) row-major flattening
    ji = (((iy << 6) | ix) << 3 | (iz >> 3)) << 3 | (iz & 7)
    ji = jnp.where(t < far[..., None], ji, -1)             # (S, R, T) i32

    chunk = SUB * SUBS_PER_CHUNK
    while N % chunk != 0 and chunk > SUB:
        chunk //= 2
    chunk = min(chunk, N)
    assert N % chunk == 0, (N, chunk)
    n_sub = chunk // SUB
    Cg = N // chunk

    ji2 = ji.reshape(S * N // SUB, SUB)
    sub_live = jnp.any(ji2 >= 0, axis=-1).astype(jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(S, Cg),
        in_specs=[
            pl.BlockSpec((n_sub, SUB), lambda s, c, lv: (s * Cg + c, 0)),
            pl.BlockSpec((1, 2 * H, 4 * H), lambda s, c, lv: (s, 0, 0)),
        ],
        out_specs=pl.BlockSpec((n_sub, SUB),
                               lambda s, c, lv: (s * Cg + c, 0)),
        scratch_shapes=[pltpu.VMEM((n_sub, SUB), jnp.int32),
                        pltpu.VMEM((n_sub, SUB), jnp.int32)],
    )
    out = pl.pallas_call(
        functools.partial(_march_kernel, H=H, n_sub=n_sub, sub=SUB,
                          int8_dot=int8_dot, Cg=Cg),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S * N // SUB, SUB), jnp.float32),
        interpret=interpret,
    )(sub_live, ji2, table)
    return out.reshape(S, R, T)
