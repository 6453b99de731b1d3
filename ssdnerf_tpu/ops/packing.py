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


def _route_from_dest(dest, live, D):
    """(S, G, SB) dest block indices -> (S, G, D, SB) bf16 routing one-hot."""
    d = jnp.arange(D, dtype=jnp.int32)
    route = ((dest[..., None, :] == d[:, None]) & live[..., None, :])
    return route.astype(jnp.bfloat16)


def band_keys_and_payload(rays_o, rays_d, ts_src, comp_valid, bound, res,
                          num_bands=16):
    """Per-source-block band keys and hat-row extents for banded packing.

    Args:
        rays_o, rays_d: (S, N, 3); ts_src: (S, N, K) per-sample t values
            in the source (per-ray compacted) layout; comp_valid the
            matching validity mask; res the triplane resolution.

    Returns:
        bandk: (S, N, K//8) int32 x-band sort keys;
        payload: (S, N, K//8, 4) f32 [fx_min, fx_max, fy_min, fy_max]
            continuous hat-row extents over each block's VALID samples
            (empty blocks get inverted extents that never widen a tile
            window).
    """
    S, N, K = ts_src.shape
    Kb = K // 8
    vb8 = comp_valid.reshape(S, N, Kb, 8)

    def block_minmax(axis):
        c = jnp.clip(rays_o[..., None, axis] + ts_src * rays_d[..., None, axis],
                     -bound, bound)
        f = jnp.clip((c + 1.0) * (res * 0.5) - 0.5, 0.0, res - 1.0)
        fb = f.reshape(S, N, Kb, 8)
        return (jnp.min(jnp.where(vb8, fb, float(res)), -1),
                jnp.max(jnp.where(vb8, fb, -1.0), -1))

    fxmin, fxmax = block_minmax(0)
    fymin, fymax = block_minmax(1)

    def band_of(lo, hi):
        return jnp.clip(((lo + hi) * (0.5 * num_bands / res)).astype(
            jnp.int32), 0, num_bands - 1)

    # 2-D Morton (x, y) band key: bit-interleaving keeps sort-adjacent
    # blocks close in BOTH plane axes, so the per-tile windows the banded
    # decode kernel needs (ops/pallas/decode.py) stay narrow in x AND y —
    # x-only keys leave the y windows at full plane width and the
    # exactness guard never passes on spatially spread samples.
    bx = band_of(fxmin, fxmax)
    by = band_of(fymin, fymax)
    nbits = max(int(num_bands - 1).bit_length(), 1)
    bandk = jnp.zeros_like(bx)
    for b in range(nbits):
        bandk = bandk | (((bx >> b) & 1) << (2 * b)) \
                      | (((by >> b) & 1) << (2 * b + 1))
    payload = jnp.stack([fxmin, fxmax, fymin, fymax], -1)
    return bandk, payload


def banded_windows(payload_b, res, band_w, tile):
    """Per-128-slot-tile plane windows + the exactness guard.

    Args:
        payload_b: (S, G, D, 5) routed band-layout extents from
            :func:`pack_groups_banded` (trailing channel = liveness).
        band_w: kernel window width (ops/pallas/decode.py BAND_W).
        tile: kernel tile width (TILE).

    Returns:
        win: (S * G * D * 8 // 1024, 1024 // tile) int32 packed
            ``wx | (wy << 8)`` per-tile windows (multiples of 16);
        ok: scalar bool — True iff EVERY tile's hat rows (over valid
            samples) fit its window, i.e. the banded kernel is exact.
    """
    S, G, D, _ = payload_b.shape
    P = D * 8
    ntile = P // tile
    bpt = tile // 8
    livep = payload_b[..., 4] > 0.5

    def tile_window(lo_ch, hi_ch):
        lo = jnp.where(livep, payload_b[..., lo_ch], float(res))
        hi = jnp.where(livep, payload_b[..., hi_ch], -1.0)
        lo = lo.reshape(S, G, ntile, bpt).min(-1)
        hi = hi.reshape(S, G, ntile, bpt).max(-1)
        w0 = jnp.clip((jnp.floor(lo).astype(jnp.int32) // 16) * 16,
                      0, res - band_w)
        hi_row = jnp.minimum(jnp.floor(hi).astype(jnp.int32) + 1, res - 1)
        return w0, hi_row <= w0 + band_w - 1

    wx, okx = tile_window(0, 1)
    wy, oky = tile_window(2, 3)
    win = (wx | (wy << 8)).reshape(S * G * ntile // (1024 // tile),
                                   1024 // tile)
    return win, jnp.all(okx & oky)


def pack_groups_banded(comp_step, comp_valid, band, budget, group_rays=16,
                       num_bands=16, block_payload=None):
    """Band-major variant of :func:`pack_groups` for the windowed decode.

    Produces TWO destination layouts over the same routed source blocks:

    - the *ray layout* of :func:`pack_groups` (each ray's samples
      contiguous in t order — what :func:`composite_packed` needs), and
    - a *band layout* where each group's live blocks are sorted by
      ``(band, ray, position)``.  Because the sample x-coordinate is
      monotone along a ray, 8-slot blocks of similar x-band land next to
      each other, so any 128-slot tile of the band layout touches only a
      narrow window of the triplane x-axis — which lets the decode kernel
      contract hat matmuls against a sliced plane (ops/pallas/decode.py).

    Decode runs in the band layout; its outputs are routed back to the ray
    layout with the returned ``conv`` block one-hot, so compositing (and
    truncation semantics, which are defined by the ray layout) are
    unchanged.

    Args:
        band: (S, R, K//8) int32 sort keys in [0, num_bands) per source
            block (only live blocks matter).
        block_payload: optional (S, R, K//8, C) per-source-block channels
            to route into the band layout (e.g. hat-row min/max for window
            computation).

    Returns:
        (pstep_r, pvalid_r, prid_r, soffs_r): the ray layout, exactly as
            :func:`pack_groups`;
        (pstep_b, pvalid_b, prid_b): the band layout;
        conv: (S, G, D, D) f32 one-hot with ``ray_blocks = conv @
            band_blocks``;
        payload_b: routed ``block_payload`` in the band layout (or None),
            plus a trailing liveness channel.
    """
    S, R, K = comp_step.shape
    Gr = group_rays
    P = budget
    assert R % Gr == 0 and P % 8 == 0 and K % 8 == 0, (R, Gr, P, K)
    G = R // Gr
    D = P // 8
    Kb = K // 8
    SB = Gr * Kb

    cv = comp_valid.reshape(S, G, Gr, K)
    cs = comp_step.reshape(S, G, Gr, K)
    c = cv.sum(-1)                                    # (S, G, Gr)
    c8 = (c + 7) // 8
    boffs = jnp.cumsum(c8, -1) - c8

    sb = jnp.arange(SB, dtype=jnp.int32)
    r_of_sb = sb // Kb
    b_of_sb = sb % Kb
    src_live = (b_of_sb < jnp.take(c8, r_of_sb, axis=-1))      # (S, G, SB)

    # ray-layout destinations and truncation (identical to pack_groups —
    # the budget semantics, including which samples overflow drops, are
    # DEFINED by the ray layout)
    dest_r = jnp.take(boffs, r_of_sb, axis=-1) + b_of_sb
    live = src_live & (dest_r < D)

    # band-layout destinations: stable sort on the band key, over the
    # SURVIVING blocks only — so both layouts hold exactly the same sample
    # set (<= D blocks) and route-back is a bijection.  Rank is computed
    # pairwise (dest_b[t] = #{u : (key_u, u) < (key_t, t)}), which is
    # key-space independent — a counting sort's (S, G, B, SB) one-hot
    # would grow 16x with the 256-value Morton keys; the (S, G, SB, SB)
    # compare matrix is fused by XLA into the reduction.
    bandk = jnp.where(live, band.reshape(S, G, SB), jnp.int32(1 << 30))
    ku = bandk[..., :, None]                          # (S, G, SB(u), 1)
    kt = bandk[..., None, :]                          # (S, G, 1, SB(t))
    tie = sb[:, None] < sb[None, :]
    prec = (ku < kt) | ((ku == kt) & tie)
    dest_b = jnp.sum(prec, axis=-2).astype(jnp.int32)  # (S, G, SB)
    route_r = _route_from_dest(dest_r, live, D)
    route_b = _route_from_dest(dest_b, live, D)

    def apply_route(route):
        src = jnp.concatenate(
            [cs.reshape(S, G, SB, 8),
             cv.reshape(S, G, SB, 8).astype(jnp.float32)], axis=-1)
        routed = jnp.einsum('sgdb,sgbw->sgdw', route,
                            src.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
        pstep = routed[..., :8].reshape(S, G, P)
        pvalid = routed[..., 8:].reshape(S, G, P) > 0.5
        rid_b = jnp.einsum('sgdb,b->sgd', route, r_of_sb.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
        prid = jnp.repeat(rid_b.astype(jnp.int32), 8, axis=-1)
        return pstep, pvalid, prid

    pstep_r, pvalid_r, prid_r = apply_route(route_r)
    pstep_b, pvalid_b, prid_b = apply_route(route_b)
    soffs_r = jnp.minimum(boffs * 8, P).astype(jnp.int32)

    # block-level layout conversion: ray_blocks = conv @ band_blocks
    conv = jnp.einsum('sgdt,sget->sgde', route_r, route_b,
                      preferred_element_type=jnp.float32)

    payload_b = None
    if block_payload is not None:
        C = block_payload.shape[-1]
        pay = jnp.concatenate(
            [block_payload.reshape(S, G, SB, C),
             jnp.ones((S, G, SB, 1), block_payload.dtype)], axis=-1)
        payload_b = jnp.einsum('sgdb,sgbc->sgdc', route_b.astype(jnp.float32),
                               pay)
    return ((pstep_r, pvalid_r, prid_r, soffs_r),
            (pstep_b, pvalid_b, prid_b), conv, payload_b)


def route_back(conv, channels):
    """Route per-slot channels from the band layout to the ray layout.

    Args:
        conv: (S, G, D, D) f32 from :func:`pack_groups_banded`.
        channels: list of (S, G, P) band-layout arrays.
    Returns:
        list of (S, G, P) ray-layout arrays (zeros in dead blocks).
    """
    S, G, D, _ = conv.shape
    n = len(channels)
    pay = jnp.stack([c.reshape(S, G, D, 8) for c in channels],
                    axis=-1).reshape(S, G, D, 8 * n)
    # HIGHEST: raw decode outputs ride this one-hot matmul and feed
    # trunc_exp, which amplifies default-precision bf16 rounding
    out = jnp.einsum('sgde,sgec->sgdc', conv, pay,
                     precision=jax.lax.Precision.HIGHEST)
    out = out.reshape(S, G, D, 8, n)
    P = D * 8
    return [out[..., i].reshape(S, G, P) for i in range(n)]


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
    D = P // 8
    tau = jnp.where(pvalid, sigmas * dts, 0.0)
    # inf guard, same as ops/compositing.py: unbounded trunc_exp can
    # make tau = inf, and the segmented scan's incl - tau would be
    # inf - inf = NaN; tau = 60 is exactly equivalent in f32
    tau = jnp.minimum(tau, 60.0)

    # All routing masks are BLOCK-granular: ``prid`` is constant within
    # 8-slot blocks and ``soffs`` is 8-aligned, so the (S, G, Gr, P) f32
    # one-hots a slot-level formulation needs (~1 GB of HBM traffic per
    # flagship render) shrink 8x to (S, G, Gr, P/8).
    rid_b = prid[..., ::8]                                     # (S, G, D)
    r_iota = jnp.arange(Gr, dtype=jnp.int32)
    bsel = (rid_b[..., None, :] == r_iota[:, None]).astype(jnp.float32)

    # Per-ray exclusive optical depth via a SEGMENTED scan (reset at each
    # ray's 8-aligned segment start), NOT a group-wide cumsum minus a
    # segment base: on trained scenes trunc_exp densities saturate
    # (tau ~ 1e5/slot), the group cumsum reaches ~1e8 where f32 ulp is
    # ~8, and the base subtraction's rounding error lands in the exp —
    # exp(+60) blow-ups that NaN'd training the moment the flagship
    # schedule turned pack_slots on (round-5 soak, bisected to this
    # line).  The segmented scan keeps magnitudes per-ray (identical
    # conditioning to the dense per-ray path) with no subtraction.
    db = jnp.arange(D, dtype=jnp.int32)
    at_startB = ((soffs >> 3)[..., None] == db)                # (S,G,Gr,D)
    slot0 = (jnp.arange(P, dtype=jnp.int32) % 8 == 0)
    start = jnp.repeat(at_startB.any(-2), 8, axis=-1) & slot0[None, None]

    def seg_op(a, b):
        f1, v1 = a
        f2, v2 = b
        return jnp.logical_or(f1, f2), jnp.where(f2, v2, v1 + v2)

    _, incl = jax.lax.associative_scan(seg_op, (start, tau), axis=-1)
    T_excl = jnp.exp(-(incl - tau))
    HI = jax.lax.Precision.HIGHEST
    alpha = 1.0 - jnp.exp(-tau)
    alive = jax.lax.stop_gradient(T_excl) >= T_thresh
    weight = jnp.where(pvalid & alive, alpha * T_excl, 0.0)

    def per_ray(v):
        vB = v.reshape(S, G, D, 8).sum(-1)
        return jnp.einsum('sgrd,sgd->sgr', bsel, vB,
                          precision=HI).reshape(S, G * Gr)

    weights_sum = per_ray(weight)
    depth = per_ray(weight * ts)
    image = jnp.stack([per_ray(weight * c) for c in rgb_ch], axis=-1)
    return weights_sum, depth, image
