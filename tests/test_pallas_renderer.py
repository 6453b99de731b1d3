"""End-to-end equivalence: Pallas fused renderer vs the XLA path."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ssdnerf_tpu.models import TriPlaneDecoder
from ssdnerf_tpu.models.decoders.renderer import volume_render
from ssdnerf_tpu.ops import packbits


def _scene(seed=0, S=2, n_rays=32, grid=64):
    rng = np.random.RandomState(seed)
    key = jax.random.PRNGKey(seed)
    code = 0.5 * jax.random.normal(key, (S, 3, 6, 128, 128))
    # coherent occupancy: solid ball + some noise voxels
    coords = np.stack(np.meshgrid(*[np.arange(grid)] * 3, indexing='ij'),
                      -1).reshape(-1, 3)
    r2 = ((coords - grid / 2 + 0.5) ** 2).sum(-1)
    occ_lin = (r2 < (grid * 0.35) ** 2) | (rng.rand(grid ** 3) < 0.02)
    g = np.broadcast_to(occ_lin.astype(np.float32), (S, grid ** 3)).copy()
    bitfield = packbits(jnp.asarray(g), 0.5)

    o = rng.randn(S, n_rays, 3).astype(np.float32) * 0.2
    o[..., 2] += 2.2
    d = -o + rng.randn(S, n_rays, 3).astype(np.float32) * 0.3
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return code, jnp.asarray(o), jnp.asarray(d), bitfield


@pytest.mark.parametrize('dt_gamma', [0.0, 0.004])
def test_fused_renderer_matches_xla(dt_gamma):
    code, rays_o, rays_d, bitfield = _scene()
    kwargs = dict(grid_size=64, dt_gamma=dt_gamma, T_thresh=1e-4)
    dec_x = TriPlaneDecoder(backend='xla', compact_steps=64)
    params = dec_x.init(jax.random.PRNGKey(1), code[:1],
                        jnp.zeros((1, 8, 3)), jnp.zeros((1, 8, 3)))
    dec_p = TriPlaneDecoder(backend='pallas-interpret', compact_steps=64)

    out_x = volume_render(dec_x, params, code, rays_o, rays_d, bitfield,
                          **kwargs)
    out_p = volume_render(dec_p, params, code, rays_o, rays_d, bitfield,
                          **kwargs)
    np.testing.assert_allclose(np.asarray(out_p['weights_sum']),
                               np.asarray(out_x['weights_sum']), atol=2e-2)
    np.testing.assert_allclose(np.asarray(out_p['image']),
                               np.asarray(out_x['image']), atol=2e-2)
    np.testing.assert_allclose(np.asarray(out_p['depth']),
                               np.asarray(out_x['depth']), atol=3e-2)


def test_fused_renderer_grads_match_xla():
    code, rays_o, rays_d, bitfield = _scene(seed=2)
    dec_x = TriPlaneDecoder(backend='xla', compact_steps=64)
    params = dec_x.init(jax.random.PRNGKey(1), code[:1],
                        jnp.zeros((1, 8, 3)), jnp.zeros((1, 8, 3)))
    dec_p = TriPlaneDecoder(backend='pallas-interpret', compact_steps=64)
    target = jnp.zeros((2, 32, 3)) + 0.3

    def loss(dec):
        def f(code, params):
            out = volume_render(dec, params, code, rays_o, rays_d, bitfield,
                                grid_size=64, dt_gamma=0.0)
            img = out['image'] + (1 - out['weights_sum'][..., None])
            return jnp.mean((img - target) ** 2) * 1e3
        return f

    gx_code, gx_p = jax.grad(loss(dec_x), (0, 1))(code, params)
    gp_code, gp_p = jax.grad(loss(dec_p), (0, 1))(code, params)

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


def test_fused_density_update_matches_xla():
    """update_density_grid routes density-only decodes through the fused
    kernel; same key => same jittered points => near-identical grids."""
    from ssdnerf_tpu.models.decoders.renderer import update_density_grid
    code, _, _, _ = _scene(seed=4)
    dec_x = TriPlaneDecoder(backend='xla', compact_steps=64)
    params = dec_x.init(jax.random.PRNGKey(1), code[:1],
                        jnp.zeros((1, 8, 3)), jnp.zeros((1, 8, 3)))
    dec_p = TriPlaneDecoder(backend='pallas-interpret', compact_steps=64)
    grid0 = jnp.zeros((2, 64 ** 3), jnp.float16)
    key = jax.random.PRNGKey(9)
    gx, bx, mx = update_density_grid(dec_x, params, code, grid0, key, 64)
    gp, bp, mp = update_density_grid(dec_p, params, code, grid0, key, 64)
    gx = np.asarray(gx, np.float32)
    gp = np.asarray(gp, np.float32)
    # bf16 matmul noise can flip threshold-adjacent bits; demand near-total
    # agreement of the bitfield and close densities
    bit_mismatch = np.mean(np.unpackbits(np.asarray(bx))
                           != np.unpackbits(np.asarray(bp)))
    assert bit_mismatch < 2e-3, bit_mismatch
    np.testing.assert_allclose(mp, mx, rtol=2e-2)
    np.testing.assert_allclose(gp, gx, atol=0.15 * max(1.0, gx.max()))
