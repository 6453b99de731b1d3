"""Cross-ray packed decoding (ops/packing.py) vs oracles and the per-ray
fused path."""
import numpy as np
import jax
import jax.numpy as jnp

from ssdnerf_tpu.models import TriPlaneDecoder
from ssdnerf_tpu.models.decoders.renderer import volume_render
from ssdnerf_tpu.ops.packing import pack_groups, composite_packed

from tests.test_pallas_renderer import _scene


def _pack_oracle(comp_step, comp_valid, P, Gr):
    S, R, K = comp_step.shape
    G = R // Gr
    D = P // 8
    pstep = np.zeros((S, G, P), np.float32)
    pvalid = np.zeros((S, G, P), bool)
    prid = np.zeros((S, G, P), np.int32)
    soffs = np.zeros((S, G, Gr), np.int32)
    for s in range(S):
        for g in range(G):
            off = 0
            for r in range(Gr):
                c = int(comp_valid[s, g * Gr + r].sum())
                c8 = (c + 7) // 8
                soffs[s, g, r] = min(off * 8, P)
                for b in range(c8):
                    d = off + b
                    if d < D:
                        sl = slice(d * 8, d * 8 + 8)
                        pstep[s, g, sl] = comp_step[s, g * Gr + r,
                                                    b * 8:b * 8 + 8]
                        pvalid[s, g, sl] = comp_valid[s, g * Gr + r,
                                                      b * 8:b * 8 + 8]
                        prid[s, g, sl] = r
                off += c8
    return pstep, pvalid, prid, soffs


def test_pack_groups_matches_oracle():
    rng = np.random.RandomState(0)
    S, R, K, Gr, P = 2, 32, 64, 16, 256   # budget small => truncation too
    n_valid = rng.randint(0, K + 1, (S, R))
    comp_valid = np.arange(K) < n_valid[..., None]
    comp_step = np.where(
        comp_valid, np.sort(rng.randint(0, 256, (S, R, K)), -1), 0
    ).astype(np.float32)

    got = pack_groups(jnp.asarray(comp_step), jnp.asarray(comp_valid), P, Gr)
    want = _pack_oracle(comp_step, comp_valid, P, Gr)
    names = ['pstep', 'pvalid', 'prid', 'soffs']
    for n, a, b in zip(names, got, want):
        a = np.asarray(a)
        if n == 'prid':  # ids at invalid slots are don't-care
            mask = np.asarray(got[1])
            a = np.where(mask, a, 0)
            b = np.where(want[1], b, 0)
        np.testing.assert_array_equal(a, b, err_msg=n)


def test_composite_packed_matches_dense_composite():
    """Packing a no-overflow stream and compositing it must reproduce the
    dense per-ray composite exactly (up to fp reassociation)."""
    from ssdnerf_tpu.ops import composite_rays
    rng = np.random.RandomState(1)
    S, R, K, Gr, P = 2, 32, 64, 16, 1024  # P=Gr*K => lossless
    n_valid = rng.randint(0, K + 1, (S, R))
    comp_valid = np.arange(K) < n_valid[..., None]
    sig = rng.rand(S, R, K).astype(np.float32) * 20
    rgb = rng.rand(S, R, K, 3).astype(np.float32)
    ts = np.sort(rng.rand(S, R, K).astype(np.float32) * 2, -1) + 0.5
    dts = rng.rand(S, R, K).astype(np.float32) * 0.05
    comp_step = np.broadcast_to(np.arange(K, dtype=np.float32), (S, R, K))

    ws_d, dep_d, img_d = composite_rays(
        jnp.asarray(sig), jnp.asarray(rgb), jnp.asarray(dts),
        jnp.asarray(ts), jnp.asarray(comp_valid), 1e-4)

    pstep, pvalid, prid, soffs = pack_groups(
        jnp.asarray(comp_step), jnp.asarray(comp_valid), P, Gr)
    # route per-sample arrays with the packed step index (here step == slot)
    G = R // Gr
    idx_r = (np.arange(G * Gr)[None].repeat(S, 0))
    ps = np.asarray(pstep).astype(np.int32)
    pr = np.asarray(prid)
    gathered = {}
    for name, arr in dict(sig=sig, ts=ts, dts=dts).items():
        a4 = arr.reshape(S, G, Gr, K)
        out = np.zeros((S, G, P), np.float32)
        for s in range(S):
            for g in range(G):
                out[s, g] = a4[s, g, pr[s, g], ps[s, g]]
        gathered[name] = jnp.asarray(out)
    rgb4 = rgb.reshape(S, G, Gr, K, 3)
    rgb_ch = []
    for c in range(3):
        out = np.zeros((S, G, P), np.float32)
        for s in range(S):
            for g in range(G):
                out[s, g] = rgb4[s, g, pr[s, g], ps[s, g], c]
        rgb_ch.append(jnp.asarray(out))

    ws_p, dep_p, img_p = composite_packed(
        gathered['sig'], tuple(rgb_ch), gathered['dts'], gathered['ts'],
        pvalid, prid, soffs, Gr, 1e-4)
    np.testing.assert_allclose(np.asarray(ws_p), np.asarray(ws_d), atol=1e-4)
    np.testing.assert_allclose(np.asarray(dep_p), np.asarray(dep_d),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_d),
                               atol=1e-4)


def test_packed_render_matches_perray():
    code, rays_o, rays_d, bitfield = _scene(seed=3, n_rays=64)
    kwargs = dict(grid_size=64, dt_gamma=0.004, T_thresh=1e-4)
    dec = TriPlaneDecoder(backend='pallas-interpret', compact_steps=64)
    params = dec.init(jax.random.PRNGKey(1), code[:1],
                      jnp.zeros((1, 8, 3)), jnp.zeros((1, 8, 3)))
    # Gr*K = 1024 = budget => no overflow, must match the per-ray path
    dec_pk = dec.clone(pack_slots=1024)

    out = volume_render(dec, params, code, rays_o, rays_d, bitfield,
                        **kwargs)
    out_pk = volume_render(dec_pk, params, code, rays_o, rays_d, bitfield,
                           **kwargs)
    for k, atol in (('weights_sum', 2e-2), ('image', 2e-2), ('depth', 3e-2)):
        np.testing.assert_allclose(np.asarray(out_pk[k]),
                                   np.asarray(out[k]), atol=atol,
                                   err_msg=k)


def test_packed_render_grads_match_perray():
    code, rays_o, rays_d, bitfield = _scene(seed=5, n_rays=64)
    dec = TriPlaneDecoder(backend='pallas-interpret', compact_steps=64)
    params = dec.init(jax.random.PRNGKey(1), code[:1],
                      jnp.zeros((1, 8, 3)), jnp.zeros((1, 8, 3)))
    dec_pk = dec.clone(pack_slots=1024)
    target = jnp.zeros((2, 64, 3)) + 0.3

    def loss(d):
        def f(code, params):
            out = volume_render(d, params, code, rays_o, rays_d, bitfield,
                                grid_size=64, dt_gamma=0.0)
            img = out['image'] + (1 - out['weights_sum'][..., None])
            return jnp.mean((img - target) ** 2) * 1e3
        return f

    gx_code, gx_p = jax.grad(loss(dec), (0, 1))(code, params)
    gp_code, gp_p = jax.grad(loss(dec_pk), (0, 1))(code, params)

    def cmp(a, b, name, atol=5e-2):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        scale = max(np.abs(b).max(), 1e-8)
        np.testing.assert_allclose(a / scale, b / scale, atol=atol,
                                   err_msg=name)

    cmp(gp_code, gx_code, 'code')
    flat_x = jax.tree_util.tree_leaves_with_path(gx_p)
    flat_p = jax.tree_util.tree_leaves_with_path(gp_p)
    for (path_x, lx), (_, lp) in zip(flat_x, flat_p):
        cmp(lp, lx, jax.tree_util.keystr(path_x))


def test_packed_render_truncation_is_prefix_faithful():
    """With an overflowing budget, early rays of each group must still
    render exactly as the per-ray path; only trailing rays lose samples."""
    code, rays_o, rays_d, bitfield = _scene(seed=7, n_rays=64)
    dec = TriPlaneDecoder(backend='pallas-interpret', compact_steps=64)
    params = dec.init(jax.random.PRNGKey(1), code[:1],
                      jnp.zeros((1, 8, 3)), jnp.zeros((1, 8, 3)))
    dec_pk = dec.clone(pack_slots=512)
    kwargs = dict(grid_size=64, dt_gamma=0.004, T_thresh=1e-4)

    out = volume_render(dec, params, code, rays_o, rays_d, bitfield,
                        **kwargs)
    out_pk = volume_render(dec_pk, params, code, rays_o, rays_d, bitfield,
                           **kwargs)
    # find, per group, rays fully inside the budget and demand parity there
    from ssdnerf_tpu.ops.marching import compact_samples
    from ssdnerf_tpu.ops import near_far_from_aabb
    from ssdnerf_tpu.ops.marching import march_rays
    aabb = jnp.asarray([-1.0] * 3 + [1.0] * 3)
    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, 0.2)
    res = jax.vmap(lambda o, d, nr, fr, bf: march_rays(
        o, d, nr, fr, bf, 64, 1.0, 0.004, 256))(
        rays_o, rays_d, nears, fars, bitfield)
    _, cv = compact_samples(res.valid, 64)
    c8 = (np.asarray(cv.sum(-1)) + 7) // 8               # (S, R)
    ends = np.cumsum(c8.reshape(2, 4, 16), -1) * 8       # block ends
    inside = (ends <= 512).reshape(2, 64)
    assert inside.any() and not inside.all()
    np.testing.assert_allclose(
        np.asarray(out_pk['image'])[inside],
        np.asarray(out['image'])[inside], atol=2e-2)


def test_pack_groups_banded_consistency():
    """Banded packing: the ray layout must equal pack_groups exactly
    (no overflow), the band layout must be band-sorted, and route_back
    must map band-layout channels onto the ray layout."""
    from ssdnerf_tpu.ops.packing import pack_groups_banded, route_back
    rng = np.random.RandomState(2)
    S, R, K, Gr, P = 2, 32, 64, 16, 1024   # lossless budget
    n_valid = rng.randint(0, K + 1, (S, R))
    comp_valid = np.arange(K) < n_valid[..., None]
    comp_step = np.where(
        comp_valid, np.sort(rng.randint(0, 256, (S, R, K)), -1), 0
    ).astype(np.float32)
    band = rng.randint(0, 16, (S, R, K // 8)).astype(np.int32)
    # payload channel 0 carries the band key itself so the band-ordering
    # invariant can be checked directly on the routed output
    payload = np.concatenate(
        [band[..., None].astype(np.float32),
         rng.rand(S, R, K // 8, 1).astype(np.float32)], -1)

    (ray, bandl, conv, payload_b) = pack_groups_banded(
        jnp.asarray(comp_step), jnp.asarray(comp_valid), jnp.asarray(band),
        P, Gr, num_bands=16, block_payload=jnp.asarray(payload))
    pstep_r, pvalid_r, prid_r, soffs_r = ray
    pstep_b, pvalid_b, prid_b = bandl

    # 1. ray layout == pack_groups
    want = pack_groups(jnp.asarray(comp_step), jnp.asarray(comp_valid),
                       P, Gr)
    for n, a, b in zip(['pstep', 'pvalid', 'prid', 'soffs'],
                       [pstep_r, pvalid_r, prid_r, soffs_r], want):
        a, b = np.asarray(a), np.asarray(b)
        if n == 'prid':
            m = np.asarray(pvalid_r)
            a, b = np.where(m, a, 0), np.where(np.asarray(want[1]), b, 0)
        np.testing.assert_array_equal(a, b, err_msg=n)

    # 2. band layout: same multiset of (step, rid) pairs per group, and
    # live blocks sorted by band key
    G = R // Gr
    sr = np.asarray(pstep_r).reshape(S, G, P)
    sb = np.asarray(pstep_b).reshape(S, G, P)
    vr = np.asarray(pvalid_r)
    vb = np.asarray(pvalid_b)
    rr = np.asarray(prid_r)
    rb = np.asarray(prid_b)
    pb_np = np.asarray(payload_b)
    for s in range(S):
        for g in range(G):
            pr = sorted(zip(sr[s, g][vr[s, g]], rr[s, g][vr[s, g]]))
            pbp = sorted(zip(sb[s, g][vb[s, g]], rb[s, g][vb[s, g]]))
            assert pr == pbp, (s, g)
            # band keys of live band-layout blocks are non-decreasing
            vblk = vb[s, g].reshape(-1, 8).any(-1)
            keys = [int(round(pb_np[s, g, d, 0]))
                    for d in np.nonzero(vblk)[0]]
            assert keys == sorted(keys), (s, g, keys)

    # 3. route_back: band channels land on the ray layout
    routed = route_back(conv, [jnp.asarray(sb), jnp.asarray(vb, np.float32)])
    np.testing.assert_allclose(np.asarray(routed[0]), np.where(vr, sr, 0),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(routed[1]),
                               vr.astype(np.float32), atol=1e-4)

    # 4. payload liveness channel marks exactly the live band blocks
    pb = np.asarray(payload_b)
    assert pb.shape == (S, G, P // 8, 3)
    np.testing.assert_array_equal(
        pb[..., 2] > 0.5, np.asarray(vb).reshape(S, G, P // 8, 8).any(-1))


def _camera_scene(S=2, hw=16, grid=64, seed=0):
    """Image-coherent rays (real camera), ball occupancy: the banded
    decode's coherence assumptions hold, like eval/GUI renders."""
    from ssdnerf_tpu.ops import get_cam_rays
    from tests.synthetic import look_at_pose
    key = jax.random.PRNGKey(seed)
    code = 0.5 * jax.random.normal(key, (S, 3, 6, 128, 128))
    coords = np.stack(np.meshgrid(*[np.arange(grid)] * 3, indexing='ij'),
                      -1).reshape(-1, 3)
    r2 = ((coords - grid / 2 + 0.5) ** 2).sum(-1)
    occ = (r2 < (grid * 0.35) ** 2).astype(np.float32)
    from ssdnerf_tpu.ops import packbits
    bitfield = packbits(jnp.asarray(np.broadcast_to(occ, (S, grid ** 3))
                                    .copy()), 0.5)
    pose = look_at_pose(np.array([1.8, 0.6, 1.8]))
    poses = jnp.asarray(np.broadcast_to(pose, (S, 1, 4, 4)).copy())
    f = hw * 131.25 / 128
    intr = jnp.asarray(np.broadcast_to(
        np.array([f, f, hw / 2, hw / 2], np.float32), (S, 1, 4)).copy())
    rays_o, rays_d = get_cam_rays(poses, intr, hw, hw)
    return (code, rays_o.reshape(S, hw * hw, 3),
            rays_d.reshape(S, hw * hw, 3), bitfield)


def test_banded_render_engages_and_matches_plain_packed():
    from ssdnerf_tpu.ops import near_far_from_aabb
    from ssdnerf_tpu.ops.marching import (SQRT3, compact_samples, march_rays,
                                          t_at_step)
    from ssdnerf_tpu.ops.packing import (band_keys_and_payload,
                                         pack_groups_banded, banded_windows)
    from ssdnerf_tpu.ops.pallas.decode import BAND_W, TILE

    code, rays_o, rays_d, bitfield = _camera_scene()
    S, N = rays_o.shape[:2]
    grid, K, P, GR, T = 64, 64, 512, 16, 256
    dt_gamma = 0.5 / 131.25

    # 1. the exactness guard must actually engage on this coherent scene
    aabb = jnp.asarray([-1.0] * 3 + [1.0] * 3)
    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, 0.2)
    res = jax.vmap(lambda o, d, nr, fr, bf: march_rays(
        o, d, nr, fr, bf, grid, 1.0, dt_gamma, T))(
        rays_o, rays_d, nears, fars, bitfield)
    comp_step, comp_valid = compact_samples(res.valid, K)
    dt_min, dt_max = 2 * SQRT3 / T, 2 * SQRT3 / grid
    dtg = jnp.full((S,), dt_gamma)
    ts_src = t_at_step(nears, comp_step, dtg[:, None, None], dt_min, dt_max)
    bandk, payload = band_keys_and_payload(
        rays_o, rays_d, ts_src, comp_valid, 1.0, 128)
    _, _, _, payload_b = pack_groups_banded(
        comp_step, comp_valid, bandk, P, GR, block_payload=payload)
    _, ok = banded_windows(payload_b, 128, BAND_W, TILE)
    assert bool(ok), 'banded guard must engage on a coherent camera scene'

    # 2. end-to-end: banded render == plain packed render
    dec = TriPlaneDecoder(backend='pallas-interpret', compact_steps=K,
                          pack_slots=P)
    params = dec.init(jax.random.PRNGKey(1), code[:1],
                      jnp.zeros((1, 8, 3)), jnp.zeros((1, 8, 3)))
    dec_b = dec.clone(banded_decode=True)
    kwargs = dict(grid_size=grid, dt_gamma=dt_gamma, T_thresh=1e-4)
    out = volume_render(dec, params, code, rays_o, rays_d, bitfield,
                        **kwargs)
    out_b = volume_render(dec_b, params, code, rays_o, rays_d, bitfield,
                          **kwargs)
    for k, atol in (('weights_sum', 2e-2), ('image', 2e-2), ('depth', 3e-2)):
        np.testing.assert_allclose(np.asarray(out_b[k]), np.asarray(out[k]),
                                   atol=atol, err_msg=k)


def test_banded_render_falls_back_on_incoherent_rays():
    """Scrambled rays break tile coherence: the guard must fall back to
    the full-width kernel and still match the plain packed path."""
    code, rays_o, rays_d, bitfield = _scene(seed=9, n_rays=64)
    dec = TriPlaneDecoder(backend='pallas-interpret', compact_steps=64,
                          pack_slots=512)
    params = dec.init(jax.random.PRNGKey(1), code[:1],
                      jnp.zeros((1, 8, 3)), jnp.zeros((1, 8, 3)))
    dec_b = dec.clone(banded_decode=True)
    kwargs = dict(grid_size=64, dt_gamma=0.004, T_thresh=1e-4)
    out = volume_render(dec, params, code, rays_o, rays_d, bitfield,
                        **kwargs)
    out_b = volume_render(dec_b, params, code, rays_o, rays_d, bitfield,
                          **kwargs)
    for k in ('weights_sum', 'image', 'depth'):
        np.testing.assert_allclose(np.asarray(out_b[k]), np.asarray(out[k]),
                                   atol=1e-5, err_msg=k)


def test_fused_composite_render_matches_split():
    """fused_composite=True (decode+composite in one kernel,
    ops/pallas/decode.py:_fwd_kernel_composite) must reproduce the split
    decode -> composite_packed path exactly on the same packed layout."""
    code, rays_o, rays_d, bitfield = _scene(seed=7, n_rays=64)
    kwargs = dict(grid_size=64, dt_gamma=0.004, T_thresh=1e-4)
    dec = TriPlaneDecoder(backend='pallas-interpret', compact_steps=64,
                          pack_slots=512)
    params = dec.init(jax.random.PRNGKey(1), code[:1],
                      jnp.zeros((1, 8, 3)), jnp.zeros((1, 8, 3)))
    dec_fc = dec.clone(fused_composite=True)

    out = volume_render(dec, params, code, rays_o, rays_d, bitfield,
                        **kwargs)
    out_fc = volume_render(dec_fc, params, code, rays_o, rays_d, bitfield,
                           **kwargs)
    for k, atol in (('weights_sum', 1e-3), ('image', 1e-3), ('depth', 2e-3)):
        np.testing.assert_allclose(np.asarray(out_fc[k]),
                                   np.asarray(out[k]), atol=atol,
                                   err_msg=k)
    # camera scene too (different occupancy/ray structure, budget overflow)
    code, rays_o, rays_d, bitfield = _camera_scene(S=2, hw=16)
    kwargs = dict(grid_size=64, dt_gamma=0.5 / 131.25, T_thresh=1e-4)
    dec = TriPlaneDecoder(backend='pallas-interpret', compact_steps=64,
                          pack_slots=256)
    params = dec.init(jax.random.PRNGKey(1), code[:1],
                      jnp.zeros((1, 8, 3)), jnp.zeros((1, 8, 3)))
    out = volume_render(dec, params, code, rays_o, rays_d, bitfield,
                        **kwargs)
    out_fc = volume_render(dec.clone(fused_composite=True), params, code,
                           rays_o, rays_d, bitfield, **kwargs)
    for k, atol in (('weights_sum', 1e-3), ('image', 1e-3), ('depth', 2e-3)):
        np.testing.assert_allclose(np.asarray(out_fc[k]),
                                   np.asarray(out[k]), atol=atol,
                                   err_msg=k)


def test_composite_packed_saturated_densities_no_overflow():
    """Trained scenes saturate trunc_exp (tau ~ 1e5/slot); the packed
    composite must stay finite and match the dense per-ray composite.
    The pre-round-5 group-cumsum-minus-base formulation lost ~60 in the
    exponent to f32 cancellation here (exp(+60) weight blow-ups that
    NaN'd the soak the moment pack_slots turned on)."""
    from ssdnerf_tpu.ops import composite_rays
    rng = np.random.RandomState(3)
    S, R, K, Gr, P = 2, 32, 64, 16, 1024
    n_valid = rng.randint(0, K + 1, (S, R))
    comp_valid = np.arange(K) < n_valid[..., None]
    # mix of empty / moderate / saturated slots like a trained surface
    sig = (rng.rand(S, R, K) ** 4 * 3.3e6).astype(np.float32)
    rgb = rng.rand(S, R, K, 3).astype(np.float32)
    ts = np.sort(rng.rand(S, R, K).astype(np.float32) * 2, -1) + 0.5
    dts = (rng.rand(S, R, K).astype(np.float32) * 0.05 + 0.002)
    comp_step = np.broadcast_to(np.arange(K, dtype=np.float32), (S, R, K))

    ws_d, dep_d, img_d = composite_rays(
        jnp.asarray(sig), jnp.asarray(rgb), jnp.asarray(dts),
        jnp.asarray(ts), jnp.asarray(comp_valid), 1e-4)

    pstep, pvalid, prid, soffs = pack_groups(
        jnp.asarray(comp_step), jnp.asarray(comp_valid), P, Gr)
    G = R // Gr
    ps = np.asarray(pstep).astype(np.int32)
    pr = np.asarray(prid)
    gathered = {}
    for name, arr in dict(sig=sig, ts=ts, dts=dts).items():
        a4 = arr.reshape(S, G, Gr, K)
        out = np.zeros((S, G, P), np.float32)
        for s in range(S):
            for g in range(G):
                out[s, g] = a4[s, g, pr[s, g], ps[s, g]]
        gathered[name] = jnp.asarray(out)
    rgb4 = rgb.reshape(S, G, Gr, K, 3)
    rgb_ch = []
    for c in range(3):
        out = np.zeros((S, G, P), np.float32)
        for s in range(S):
            for g in range(G):
                out[s, g] = rgb4[s, g, pr[s, g], ps[s, g], c]
        rgb_ch.append(jnp.asarray(out))

    ws_p, dep_p, img_p = composite_packed(
        gathered['sig'], tuple(rgb_ch), gathered['dts'], gathered['ts'],
        pvalid, prid, soffs, Gr, 1e-4)
    assert np.isfinite(np.asarray(ws_p)).all()
    assert float(np.asarray(ws_p).max()) <= 1.0 + 1e-4
    np.testing.assert_allclose(np.asarray(ws_p), np.asarray(ws_d), atol=1e-4)
    np.testing.assert_allclose(np.asarray(dep_p), np.asarray(dep_d),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_d),
                               atol=1e-4)
