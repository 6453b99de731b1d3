"""Occupancy-grid ray marching, TPU-native formulation.

Replaces the CUDA ``kernel_march_rays_train`` / ``kernel_march_rays``
(/root/reference/lib/ops/raymarching/src/raymarching.cu:311-492,705-822).

Key design: the CUDA kernel's "empty-space skip" (do-while stepping ``dt``
until the next voxel boundary) advances ``t`` through *exactly the same
t-sequence* as stepping one ``dt`` at a time — the skip is purely a serial
compute optimization, and the t-recurrence ``t_{k+1} = t_k + clamp(t_k *
dt_gamma, dt_min, dt_max)`` is independent of occupancy.  Better still, the
recurrence has a CLOSED FORM in three phases — linear while ``t*gamma <
dt_min``, geometric ``t_k = t1*(1+gamma)^k`` in between, linear with
``dt_max`` after — so the whole ``[num_rays, max_steps]`` t-grid is one
vectorized expression: no scan, no atomics, no D2H sync (the reference
wrapper syncs on ``step_counter.item()`` at raymarching.py:269), static
shapes throughout.  Occupancy is one batched bitfield gather; the decode +
composite stages simply ignore invalid slots.
"""
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

SQRT3 = float(np.sqrt(3.0))


class MarchResults(NamedTuple):
    ts: jnp.ndarray      # (num_rays, max_steps) sample start distances
    dts: jnp.ndarray     # (num_rays, max_steps) RGB integration step sizes
    valid: jnp.ndarray   # (num_rays, max_steps) bool: sample is in an occupied voxel


def march_rays(rays_o, rays_d, nears, fars, density_bitfield, grid_size,
               bound=1.0, dt_gamma=0.0, max_steps=256, perturb_noise=None,
               num_slots=None):
    """March rays through an occupancy bitfield (single scene).

    Args:
        rays_o, rays_d: (N, 3) origins / unit directions.
        nears, fars: (N,) from :func:`near_far_from_aabb`.
        density_bitfield: (grid_size**3 // 8,) uint8, Morton voxel order.
        grid_size: static int (H).
        bound: scene half-extent (scalar).
        dt_gamma: cone-stepping factor (scalar, may be traced).
        max_steps: static int; both the trip count and per-ray sample cap.
            Because every trip advances >= dt_min = 2*sqrt(3)/max_steps and
            the in-box range is <= 2*sqrt(3)*bound, max_steps trips always
            cover the full ray extent for bound == 1.
        perturb_noise: optional (N,) uniform [0,1) jitter of the start t
            (matches raymarching.cu:351).
        num_slots: number of sample slots to generate (default max_steps).
            ``max_steps`` always sets the dt scale; a smaller slot count
            (with tightened nears/fars, see volume_render) marches a shorter
            range at identical step sizes.

    Returns:
        MarchResults with (N, num_slots) arrays.
    """
    H = grid_size
    num_slots = max_steps if num_slots is None else num_slots
    dt_min = 2.0 * SQRT3 / max_steps
    dt_max = 2.0 * SQRT3 / H  # C == 1 mip (all reference configs)
    mip_bound = min(1.0, float(bound))

    t0 = nears
    if perturb_noise is not None:
        t0 = t0 + jnp.clip(t0 * dt_gamma, dt_min, dt_max) * perturb_noise

    ts = t_sequence(t0, dt_gamma, dt_min, dt_max, num_slots)  # (N, K)
    dts = jnp.clip(ts * dt_gamma, dt_min, dt_max)

    x = jnp.clip(rays_o[:, None, :] + ts[..., None] * rays_d[:, None, :],
                 -bound, bound)
    n = jnp.clip((0.5 * (x / mip_bound + 1.0) * H).astype(jnp.int32),
                 0, H - 1)
    # density grids/bitfields use LINEAR (x, y, z) voxel order internally
    # (Morton only at .pth cache-interop boundaries, tools/convert_cache.py)
    idx = (n[..., 0] * H + n[..., 1]) * H + n[..., 2]  # (N, K)
    byte = density_bitfield[idx >> 3]
    occ = ((byte >> (idx & 7).astype(jnp.uint8)) & 1).astype(jnp.bool_)
    valid = occ & (ts < fars[:, None])
    return MarchResults(ts=ts, dts=dts, valid=valid)


def t_sequence(t0, dt_gamma, dt_min, dt_max, num_steps):
    """Closed-form evaluation of the marching recurrence
    ``t_{k+1} = t_k + clamp(t_k * dt_gamma, dt_min, dt_max)`` for all k.

    Three phases (boundaries A = dt_min/gamma, B = dt_max/gamma):
      1. t < A: arithmetic with step dt_min.
      2. A <= t < B: geometric, t_{k+1} = t_k * (1 + gamma).
      3. t >= B: arithmetic with step dt_max.

    Args:
        t0: (N,) start distances.
        dt_gamma: scalar (possibly traced) cone factor >= 0.
        num_steps: static int K.

    Returns (N, K) t values (t_k is the distance BEFORE step k advances).
    """
    k = jnp.arange(num_steps, dtype=jnp.float32)[None]      # (1, K)
    t0 = t0[:, None]                                        # (N, 1)
    g = jnp.maximum(jnp.asarray(dt_gamma, jnp.float32), 0.0)
    g_safe = jnp.maximum(g, 1e-12)
    A = dt_min / g_safe
    B = dt_max / g_safe
    log1pg = jnp.log1p(g_safe)

    # phase-1 step count from t0 (0 when t0 already >= A)
    n1 = jnp.ceil(jnp.maximum(A - t0, 0.0) / dt_min)
    t1 = t0 + n1 * dt_min                                   # first t >= A
    # phase-2 step count from t1 (0 when t1 >= B)
    n2 = jnp.ceil(jnp.maximum(jnp.log(B / jnp.maximum(t1, 1e-12)), 0.0)
                  / log1pg)
    t2 = t1 * jnp.exp(n2 * log1pg)                          # first t >= B

    t_lin1 = t0 + k * dt_min
    t_geo = t1 * jnp.exp((k - n1) * log1pg)
    t_lin2 = t2 + (k - n1 - n2) * dt_max
    ts = jnp.where(k < n1, t_lin1, jnp.where(k < n1 + n2, t_geo, t_lin2))
    # gamma == 0: pure arithmetic with dt_min
    return jnp.where(g > 0, ts, t_lin1)


def t_at_step(t0, step_k, dt_gamma, dt_min, dt_max):
    """Evaluate the closed-form t-recurrence at arbitrary (float) step
    indices ``step_k`` (same math as :func:`t_sequence` but with a given
    k-grid instead of arange) — used to re-derive t values for compacted
    sample slots from their step indices."""
    t0 = t0[..., None]
    k = step_k
    g = jnp.maximum(jnp.asarray(dt_gamma, jnp.float32), 0.0)
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


def occupied_aabb(density_bitfield, grid_size, bound):
    """Per-scene tight world-space AABB of the occupied voxels.

    Marching only inside this box (with a reduced slot count) is exact:
    everything outside is provably unoccupied so those samples would be
    masked invalid anyway.  Empty scenes yield a degenerate box (lo > hi).

    Args:
        density_bitfield: (..., H^3 // 8) uint8 Morton-ordered.
    Returns:
        (..., 6) [xmin, ymin, zmin, xmax, ymax, zmax].
    """
    from .morton import unpackbits
    H = grid_size
    occ = unpackbits(density_bitfield)                       # (..., H^3)
    lin = jnp.arange(H ** 3, dtype=jnp.int32)
    coords = jnp.stack([lin // (H * H), (lin // H) % H, lin % H], axis=-1)
    coords = coords.astype(jnp.float32)
    big = jnp.float32(H)
    lo_idx = jnp.min(jnp.where(occ[..., None], coords, big), axis=-2)
    hi_idx = jnp.max(jnp.where(occ[..., None], coords + 1.0, 0.0), axis=-2)
    voxel = 2.0 * bound / H
    lo = -bound + lo_idx * voxel
    hi = -bound + hi_idx * voxel
    return jnp.concatenate([lo, hi], axis=-1)


def compact_samples(valid, compact_steps, dtype=jnp.bfloat16):
    """Gather-free per-ray compaction of valid sample slots.

    For each ray, produces the step indices of its first ``compact_steps``
    valid samples, via an exclusive-cumsum position + one-hot contraction
    (an MXU matmul — TPU gathers/scatters are ~10ns/element and would
    dominate).  Step indices <= 256 are exact in bf16.

    Args:
        valid: (..., T) bool.
        compact_steps: static K << T.

    Returns:
        comp_step: (..., K) float32 step indices (0 where empty);
        comp_valid: (..., K) bool.
    """
    T = valid.shape[-1]
    K = compact_steps
    pos = jnp.cumsum(valid, axis=-1) - 1                    # position of slot
    keep = valid & (pos < K)
    steps = jnp.arange(T, dtype=dtype)
    if K % 8 == 0:
        # factorized position one-hot: [pos==k] = [pos>>3==k>>3][pos&7==k&7]
        # — the (..., T, K) one-hot this replaces is 4.3 GB per flagship
        # render (HBM-bound); the two factors are (..., T, 8) and
        # (..., K/8, T), 8x smaller combined.  Each output still sums
        # exactly one nonzero product (step indices < 256 are exact bf16).
        pl = (pos & 7)[..., None]
        ph = pos >> 3
        X = jnp.where((pl == jnp.arange(8)) & keep[..., None],
                      steps[:, None], 0).astype(dtype)       # (..., T, 8)
        Y = ((ph[..., None, :] == jnp.arange(K // 8)[:, None])
             & keep[..., None, :]).astype(dtype)             # (..., K/8, T)
        comp = jnp.einsum('...ht,...tl->...hl', Y, X,
                          preferred_element_type=jnp.float32)
        comp_step = comp.reshape(comp.shape[:-2] + (K,))
    else:
        onehot = ((pos[..., None] == jnp.arange(K))
                  & keep[..., None]).astype(dtype)
        comp_step = jnp.einsum('...tk,t->...k', onehot, steps,
                               preferred_element_type=jnp.float32)
    n_valid = jnp.sum(valid, axis=-1)
    comp_valid = jnp.arange(K) < jnp.minimum(n_valid, K)[..., None]
    return comp_step, comp_valid
