"""Cross-ray sample packing (gather-free, block-granular).

At 10% occupancy the per-ray compaction (ops/marching.py
``compact_samples``) leaves ~60% of its K=64 slots invalid padding: the
mean valid count is ~26 but K must cover the per-ray max.  This module
packs the *compacted* streams of groups of ``group_rays`` rays into a
shared per-group slot budget, nearly eliminating the padding — decode
work drops roughly (mean_valid * group_rays) / budget-fold.

Semantics follow the reference's ``mean_count`` point-budget capping
(/root/reference/lib/ops/raymarching/raymarching.py:243-246): when a
group's rays hold more samples than the budget, trailing rays lose their
deepest samples (deterministically, unlike the reference's atomic-order
nondeterminism).  The per-ray cap K of ``compact_samples`` still applies
first, so an un-overflowed group renders bit-identically to the per-ray
path.

TPU design: a slot-exact pack would need a (dense 1024 -> packed P)
per-slot permutation — ~4.3G fused VPU ops per full render.  Instead each
ray's packed region is 8-slot aligned (``roundup8`` of its valid count,
~13% padding at the flagship shape), which makes the permutation
*block-structured*: routing is a (P/8, group_rays*K/8) one-hot built from
dense compares, applied to 8-wide slot blocks as one small batched MXU
matmul (~1G MACs per full render).  Everything else per-slot (t, xyz,
dt) is re-derived closed-form from the routed step index, so nothing
else is permuted.  Compositing happens directly in the packed layout via
segment arithmetic (8-aligned segment bases), with per-ray reductions as
ray-one-hot contractions.
"""
import jax
import jax.numpy as jnp


def pack_groups(comp_step, comp_valid, budget, group_rays=16):
    """Pack per-ray compacted sample streams into per-group slot budgets.

    Args:
        comp_step: (S, R, K) f32 step indices from ``compact_samples``
            (each ray's valid samples packed first).
        comp_valid: (S, R, K) bool, True exactly for the first ``n_valid``
            slots of each ray.
        budget: static P, slots per group; multiple of 8.
        group_rays: static rays per group (R must divide).

    Returns:
        pstep: (S, G, P) f32 routed step indices (0 where invalid).
        pvalid: (S, G, P) bool.
        prid: (S, G, P) int32 local ray id in [0, group_rays).
        soffs: (S, G, group_rays) int32 slot offset of each ray's segment
            (8-aligned; == P for fully-truncated rays).
    """
    S, R, K = comp_step.shape
    Gr = group_rays
    P = budget
    assert R % Gr == 0 and P % 8 == 0 and K % 8 == 0, (R, Gr, P, K)
    G = R // Gr
    D = P // 8                      # dest blocks per group
    Kb = K // 8                     # blocks per ray
    SB = Gr * Kb                    # source blocks per group

    cv = comp_valid.reshape(S, G, Gr, K)
    cs = comp_step.reshape(S, G, Gr, K)
    c = cv.sum(-1)                                    # (S, G, Gr)
    c8 = (c + 7) // 8                                 # blocks per ray
    boffs = jnp.cumsum(c8, -1) - c8                   # dest-block offsets

    sb = jnp.arange(SB, dtype=jnp.int32)
    r_of_sb = sb // Kb
    b_of_sb = sb % Kb
    dest = jnp.take(boffs, r_of_sb, axis=-1) + b_of_sb         # (S, G, SB)
    live = (b_of_sb < jnp.take(c8, r_of_sb, axis=-1)) & (dest < D)

    d = jnp.arange(D, dtype=jnp.int32)
    route = ((dest[..., None, :] == d[:, None]) & live[..., None, :])
    route = route.astype(jnp.bfloat16)                # (S, G, D, SB)

    # route 8-wide blocks of [step, valid] through one batched MXU matmul
    src = jnp.concatenate([cs.reshape(S, G, SB, 8),
                           cv.reshape(S, G, SB, 8).astype(jnp.float32)],
                          axis=-1)                    # (S, G, SB, 16)
    routed = jnp.einsum('sgdb,sgbw->sgdw', route, src.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
    pstep = routed[..., :8].reshape(S, G, P)
    pvalid = routed[..., 8:].reshape(S, G, P) > 0.5

    # per-dest-block ray id (constant within a block)
    rid_b = jnp.einsum('sgdb,b->sgd', route,
                       r_of_sb.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
    prid = jnp.repeat(rid_b.astype(jnp.int32), 8, axis=-1)     # (S, G, P)

    soffs = jnp.minimum(boffs * 8, P).astype(jnp.int32)
    return pstep, pvalid, prid, soffs


def composite_packed(sigmas, rgb_ch, dts, ts, pvalid, prid, soffs,
                     group_rays, T_thresh=1e-4):
    """Alpha-composite a packed sample stream into per-ray outputs.

    The optical-depth cumsum runs over the whole group; each ray's
    transmittance subtracts the cumulative value at its (8-aligned)
    segment start, which is exact because segments are contiguous.

    Args:
        sigmas, dts, ts: (S, G, P) per-slot values.
        rgb_ch: tuple of 3 (S, G, P) color channels (channel-separate to
            avoid the 42x lane padding of a trailing dim of 3).
        pvalid, prid, soffs: from :func:`pack_groups`.
        group_rays: static Gr.

    Returns:
        weights_sum, depth: (S, R); image: (S, R, 3) with R = G*Gr.
    """
    S, G, P = sigmas.shape
    Gr = group_rays
    tau = jnp.where(pvalid, sigmas * dts, 0.0)
    cum = jnp.cumsum(tau, axis=-1)
    excl = cum - tau

    # segment-start exclusive optical depth, per ray then per slot
    j = jnp.arange(P, dtype=jnp.int32)
    at_start = (j == soffs[..., None]).astype(jnp.float32)     # (S,G,Gr,P)
    base_r = jnp.einsum('sgrp,sgp->sgr', at_start, excl)
    r_iota = jnp.arange(Gr, dtype=jnp.int32)
    slot_is_r = (prid[..., None, :] == r_iota[:, None])        # (S,G,Gr,P)
    base_j = jnp.einsum('sgrp,sgr->sgp', slot_is_r.astype(jnp.float32),
                        base_r)

    T_excl = jnp.exp(-(excl - base_j))
    alpha = 1.0 - jnp.exp(-tau)
    alive = jax.lax.stop_gradient(T_excl) >= T_thresh
    weight = jnp.where(pvalid & alive, alpha * T_excl, 0.0)

    sel = slot_is_r.astype(jnp.float32)
    def per_ray(v):
        return jnp.einsum('sgrp,sgp->sgr', sel, v).reshape(S, G * Gr)

    weights_sum = per_ray(weight)
    depth = per_ray(weight * ts)
    image = jnp.stack([per_ray(weight * c) for c in rgb_ch], axis=-1)
    return weights_sum, depth, image
