"""Pallas renderer kernels vs pure-JAX oracles (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ssdnerf_tpu.ops import march_rays, near_far_from_aabb, packbits
from ssdnerf_tpu.ops.pallas.decode import (triplane_decode, decode_reference)
from ssdnerf_tpu.ops.pallas.march import (occupancy_table, march_valid_mask)


def test_occupancy_table_matches_linear_bitfield():
    H = 64
    rng = np.random.RandomState(0)
    grid = rng.rand(2, H ** 3).astype(np.float32)
    bitfield = packbits(jnp.asarray(grid), 0.9)
    tab = np.asarray(occupancy_table(bitfield, H)).astype(np.int32)
    # oracle: byte at flat = y*8H + x*8 + zb (stored as (128, 256) int8
    # with a -128 offset) packs occ(x, y, zb*8+j) for j in 0..7
    coords = rng.randint(0, H, size=(200, 3)).astype(np.int32)
    lin = (coords[:, 0] * H + coords[:, 1]) * H + coords[:, 2]
    bf = np.asarray(bitfield)
    occ_ref = (bf[:, lin >> 3] >> (lin & 7).astype(np.uint8)) & 1
    x, y, z = coords[:, 0], coords[:, 1], coords[:, 2]
    flat = y * 8 * H + x * 8 + (z >> 3)
    byte = tab[:, flat >> 8, flat & 255] + 128
    occ_tab = (byte >> (z & 7)) & 1
    np.testing.assert_array_equal(occ_tab, occ_ref)


def test_march_valid_mask_matches_xla_march():
    H, T, bound = 64, 256, 1.0
    S, R = 2, 64
    rng = np.random.RandomState(1)
    key = jax.random.PRNGKey(0)
    # coherent-ish occupancy: a solid ball
    coords = np.stack(np.meshgrid(*[np.arange(H)] * 3, indexing='ij'),
                      -1).reshape(-1, 3)
    r2 = ((coords - H / 2 + 0.5) ** 2).sum(-1)
    occ_lin = (r2 < (H * 0.3) ** 2).astype(np.float32)
    grid = np.broadcast_to(occ_lin, (S, H ** 3)).copy()
    grid[1] = rng.rand(H ** 3) < 0.05  # plus a random scene
    bitfield = packbits(jnp.asarray(grid), 0.5)

    rays_o = jnp.asarray(rng.randn(S, R, 3).astype(np.float32)) * 0.1 \
        + jnp.asarray([0., 0., 2.5])
    rays_d = -rays_o + jnp.asarray(rng.randn(S, R, 3).astype(np.float32)) * .3
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    aabb = jnp.asarray([-bound] * 3 + [bound] * 3, jnp.float32)
    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, 0.2)
    dt_gamma = jnp.asarray([0.0, 0.004], jnp.float32)
    noise = jax.random.uniform(key, (S, R))
    dt_min = 2 * np.sqrt(3) / T
    dt_max = 2 * np.sqrt(3) / H
    t0 = nears + jnp.clip(nears * dt_gamma[:, None], dt_min, dt_max) * noise

    ref = jax.vmap(lambda o, d, nr, fr, bf, dg, nz: march_rays(
        o, d, nr, fr, bf, H, bound, dg, T, nz))(
        rays_o, rays_d, nears, fars, bitfield, dt_gamma, noise)

    tab = occupancy_table(bitfield, H)
    pack = jnp.concatenate([rays_o, rays_d, t0[..., None], fars[..., None]],
                           axis=-1)
    valid = march_valid_mask(pack, tab, dt_gamma, T=T, grid_size=H,
                             bound=bound, max_steps=T, interpret=True)
    mismatch = np.mean(np.asarray(valid, bool) != np.asarray(ref.valid))
    # t values right at voxel boundaries may quantize differently in the
    # fused f32 math; require bit-identical occupancy for ~all samples
    assert mismatch < 2e-3, mismatch


def _decode_inputs(seed=0, S=2, R=16, K=64, res=128, C=6, hidden=64):
    rng = np.random.RandomState(seed)
    planes = jnp.asarray(rng.randn(S, 3, C * res, res).astype(np.float32)
                         ).astype(jnp.bfloat16)
    x, y, z = (jnp.asarray(rng.uniform(-1, 1, (S, R, K)).astype(np.float32))
               for _ in range(3))
    dir_out = jnp.asarray(rng.randn(S, R, hidden).astype(np.float32)) * 0.3
    wb = rng.randn(3, hidden, C).astype(np.float32) * 0.2
    # kernel base-weight layout: (hidden, 3C) with columns p*C + c
    wf = jnp.asarray(wb.transpose(1, 0, 2).reshape(hidden, 3 * C)
                     ).astype(jnp.bfloat16)
    bbt = jnp.asarray(rng.randn(hidden, 1).astype(np.float32)) * 0.1
    w1t = np.zeros((128, hidden), np.float32)
    w1t[0] = rng.randn(hidden) * 0.3
    w2t = np.zeros((128, hidden), np.float32)
    w2t[:3] = rng.randn(3, hidden) * 0.3
    b1 = np.zeros((1, 128), np.float32)
    b1[0, 0] = 0.1
    b2 = np.zeros((1, 128), np.float32)
    b2[0, :3] = rng.randn(3) * 0.1
    return (planes, x, y, z, dir_out, wf, bbt, jnp.asarray(b1),
            jnp.asarray(b2), jnp.asarray(w1t).astype(jnp.bfloat16),
            jnp.asarray(w2t).astype(jnp.bfloat16), K)


def _with_rid(args, rid=None):
    """Insert the (new) rid argument into a decode arg tuple."""
    return args[:4] + (rid,) + args[4:]


def test_triplane_decode_forward_matches_reference():
    args = _decode_inputs()
    outs = triplane_decode(*_with_rid(args), rpc=None, interpret=True)
    refs = decode_reference(*args)
    for o, r, name in zip(outs, refs, 'sigma r g b'.split()):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=0, atol=3e-2, err_msg=name)


def test_triplane_decode_grads_match_reference():
    (planes, x, y, z, dir_out, wf, bb, b1, b2, w1t, w2t, K) = \
        _decode_inputs(seed=3)
    rng = np.random.RandomState(7)
    g_outs = tuple(jnp.asarray(rng.randn(*x.shape).astype(np.float32))
                   for _ in range(4))

    def make_loss(fn, kernel=False):
        def loss(planes, dir_out, wf, bb, b1, b2, w1t, w2t):
            if kernel:
                outs = fn(planes.astype(jnp.bfloat16), x, y, z, None,
                          dir_out, wf.astype(jnp.bfloat16), bb, b1, b2,
                          w1t.astype(jnp.bfloat16),
                          w2t.astype(jnp.bfloat16), K, None, True)
            else:
                outs = fn(planes.astype(jnp.bfloat16), x, y, z, dir_out,
                          wf.astype(jnp.bfloat16), bb, b1, b2,
                          w1t.astype(jnp.bfloat16),
                          w2t.astype(jnp.bfloat16), K)
            return sum(jnp.sum(o * g) for o, g in zip(outs, g_outs))
        return loss

    argnums = tuple(range(8))
    f32 = jnp.float32
    args = (planes.astype(f32), dir_out, wf.astype(f32), bb, b1, b2,
            w1t.astype(f32), w2t.astype(f32))
    gk = jax.grad(make_loss(triplane_decode, True), argnums)(*args)
    gr = jax.grad(make_loss(decode_reference), argnums)(*args)
    names = ['planes', 'dir_out', 'wf', 'bb', 'b1', 'b2', 'w1t', 'w2t']
    for n, a, b in zip(names, gk, gr):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        scale = max(np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(a / scale, b / scale, rtol=0, atol=4e-2,
                                   err_msg=n)


def test_triplane_decode_banded_matches_reference():
    """Windowed-hat banded forward kernel vs the oracle, on tile-coherent
    coordinates whose hat rows fit the declared per-tile windows."""
    from ssdnerf_tpu.ops.pallas.decode import (
        triplane_decode_banded, BAND_W, TILE, SUB)
    S, R, K, res, C, hidden = 2, 16, 64, 128, 6, 64
    (planes, x, y, z, dir_out, wf, bbt, b1, b2, w1t, w2t, _K) = \
        _decode_inputs(seed=11, S=S, R=R, K=K, res=res, C=C, hidden=hidden)
    rng = np.random.RandomState(13)
    N = R * K
    n_tiles = N // TILE

    # tile-coherent x/y: each 128-sample tile lives inside a BAND_W window
    def windowed_coord(lo_all):
        f = np.empty((S, n_tiles, TILE), np.float32)
        for s in range(S):
            for t in range(n_tiles):
                lo = lo_all[s, t]
                f[s, t] = rng.uniform(lo + 1.0, lo + BAND_W - 2.0, TILE)
        return ((f + 0.5) * (2.0 / res) - 1.0).reshape(S, R, K)

    lox = (rng.randint(0, (res - BAND_W) // 16 + 1, (S, n_tiles)) * 16)
    loy = (rng.randint(0, (res - BAND_W) // 16 + 1, (S, n_tiles)) * 16)
    x = jnp.asarray(windowed_coord(lox))
    y = jnp.asarray(windowed_coord(loy))
    win = jnp.asarray((lox | (loy << 8)).astype(np.int32)
                      ).reshape(S * N // SUB, SUB // TILE)

    planesT = planes.swapaxes(-1, -2)
    outs = triplane_decode_banded(
        planesT, x, y, z, None, win, dir_out, wf, bbt, b1, b2, w1t, w2t,
        K, rpc=SUB // K, interpret=True)
    refs = decode_reference(planes, x, y, z, dir_out, wf, bbt, b1, b2,
                            w1t, w2t, K)
    for o, r, name in zip(outs, refs, 'sigma r g b'.split()):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=0, atol=3e-2, err_msg=name)


# --------------------------------------------------------------------- #
# VMEM attention core (ops/pallas/attention.py)
# --------------------------------------------------------------------- #
def test_vmem_attention_fwd_bwd_parity():
    """Kernel fwd + custom-VJP bwd vs the XLA attention core."""
    from ssdnerf_tpu.ops.pallas.attention import vmem_attention
    rng = np.random.RandomState(7)
    G, T, hd = 4, 512, 64
    scale = 1.0 / np.sqrt(hd)
    q, k, v = (jnp.asarray(rng.randn(G, T, hd).astype(np.float32))
               for _ in range(3))

    def xla_core(q, k, v):
        w = jnp.einsum('gtc,gsc->gts', q, k,
                       preferred_element_type=jnp.float32) * scale
        w = jax.nn.softmax(w, axis=-1)
        return jnp.einsum('gts,gsc->gtc', w, v)

    out = vmem_attention(q, k, v, scale, True)
    ref = xla_core(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=2e-4)

    # grads of a scalar loss through both paths
    gfn = jax.grad(lambda q, k, v:
                   jnp.sum(jnp.sin(vmem_attention(q, k, v, scale, True))),
                   argnums=(0, 1, 2))
    rfn = jax.grad(lambda q, k, v: jnp.sum(jnp.sin(xla_core(q, k, v))),
                   argnums=(0, 1, 2))
    for g_, r_, name in zip(gfn(q, k, v), rfn(q, k, v), 'qkv'):
        np.testing.assert_allclose(np.asarray(g_), np.asarray(r_),
                                   rtol=0, atol=5e-4, err_msg=name)


def test_self_attention_kernel_path_interpret():
    """The module-level kernel branch (reshapes, dtype selection,
    residual) vs the XLA core, on CPU via attn_kernel='interpret' —
    covers both plain and grouped (tiled-triplane) attention."""
    from ssdnerf_tpu.models.architecture.unet import SelfAttention
    rng = jax.random.PRNGKey(2)
    for g, res, C in ((1, 32, 256), (3, 16, 768)):
        at_k = SelfAttention(4, g, 32, attn_kernel='interpret')
        at_x = SelfAttention(4, g, 32, attn_kernel=False)
        x = jax.random.normal(rng, (2, res, res, C))
        p = at_x.init(rng, x)
        leaves, treedef = jax.tree_util.tree_flatten(p)
        ks = jax.random.split(jax.random.PRNGKey(5), len(leaves))
        p = jax.tree_util.tree_unflatten(
            treedef, [l + 0.05 * jax.random.normal(kk, l.shape, l.dtype)
                      for l, kk in zip(leaves, ks)])
        ok = at_k.apply(p, x)
        ox = at_x.apply(p, x)
        np.testing.assert_allclose(np.asarray(ok), np.asarray(ox),
                                   rtol=0, atol=2e-4,
                                   err_msg=f'g={g}')
