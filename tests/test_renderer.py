"""Tests for the triplane decoder and the volume-rendering pipeline."""
import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import pytest

from ssdnerf_tpu.models import TriPlaneDecoder
from ssdnerf_tpu.models.decoders.renderer import (
    volume_render, update_density_grid, get_density)
from ssdnerf_tpu.ops import get_cam_rays, unpackbits


class ConstDecoder(nn.Module):
    """Analytic decoder for closed-form rendering checks."""
    sigma: float = 2.0
    bound: float = 1.0
    min_near: float = 0.05
    max_steps: int = 256

    @nn.compact
    def __call__(self, code, xyzs, dirs=None, density_only=False,
                 deterministic=True):
        dummy = self.param('w', nn.initializers.ones, (1,))
        sig = jnp.full(xyzs.shape[:-1], self.sigma) * dummy[0]
        rgb = None if density_only else jnp.full(xyzs.shape, 0.5)
        return sig, rgb


def _full_bitfield(num_scenes, grid_size):
    return jnp.full((num_scenes, grid_size ** 3 // 8), 255, jnp.uint8)


def test_volume_render_constant_density_analytic():
    """weights_sum of a constant-sigma field ~= 1 - exp(-sigma * path_len)."""
    dec = ConstDecoder(sigma=3.0)
    params = dec.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 2, 4, 4)),
                      jnp.zeros((1, 8, 3)), jnp.zeros((1, 8, 3)))
    # rays through the box center along +z
    N = 4
    o = np.zeros((1, N, 3), np.float32)
    o[..., 2] = -2.0
    o[0, :, 0] = np.linspace(-0.5, 0.5, N)
    d = np.zeros((1, N, 3), np.float32)
    d[..., 2] = 1.0
    out = volume_render(dec, params, jnp.zeros((1, 3, 2, 4, 4)),
                        jnp.array(o), jnp.array(d), _full_bitfield(1, 8), 8,
                        T_thresh=1e-6)
    path_len = 2.0  # box from z=-1 to z=1
    expected_ws = 1 - np.exp(-3.0 * path_len)
    np.testing.assert_allclose(np.array(out['weights_sum'][0]), expected_ws,
                               atol=0.02)
    np.testing.assert_allclose(np.array(out['image'][0]),
                               0.5 * expected_ws, atol=0.02)
    # depth ~ weighted mean distance: entry at t=1, mean free path 1/sigma
    assert np.all(np.array(out['depth'][0]) > 1.0)
    # gradient flows to decoder params
    g = jax.grad(lambda p: volume_render(
        dec, p, jnp.zeros((1, 3, 2, 4, 4)), jnp.array(o), jnp.array(d),
        _full_bitfield(1, 8), 8)['image'].sum())(params)
    assert np.isfinite(float(jax.tree_util.tree_leaves(g)[0][0]))


def test_volume_render_step_chunking_consistent():
    dec = ConstDecoder(sigma=1.5, max_steps=64)
    params = dec.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 2, 4, 4)),
                      jnp.zeros((1, 8, 3)), jnp.zeros((1, 8, 3)))
    rng = np.random.RandomState(0)
    o = rng.uniform(-2, 2, (2, 16, 3)).astype(np.float32)
    d = rng.normal(size=(2, 16, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    kwargs = dict(dt_gamma=0.0, T_thresh=1e-4)
    out_a = volume_render(dec, params, jnp.zeros((2, 3, 2, 4, 4)),
                          jnp.array(o), jnp.array(d), _full_bitfield(2, 8), 8,
                          **kwargs)
    out_b = volume_render(dec, params, jnp.zeros((2, 3, 2, 4, 4)),
                          jnp.array(o), jnp.array(d), _full_bitfield(2, 8), 8,
                          step_chunk=16, **kwargs)
    for k in ['weights_sum', 'depth', 'image']:
        np.testing.assert_allclose(np.array(out_a[k]), np.array(out_b[k]),
                                   atol=1e-5)


def test_triplane_decoder_shapes_and_determinism():
    dec = TriPlaneDecoder(base_layers=(18, 64), density_layers=(64, 1),
                          color_layers=(64, 3), dir_layers=(16, 64))
    code = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 6, 16, 16))
    xyz = jax.random.uniform(jax.random.PRNGKey(2), (2, 32, 3), minval=-1,
                             maxval=1)
    dirs = jax.random.normal(jax.random.PRNGKey(3), (2, 32, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    params = dec.init(jax.random.PRNGKey(0), code, xyz, dirs)
    sig, rgb = dec.apply(params, code, xyz, dirs)
    assert sig.shape == (2, 32) and rgb.shape == (2, 32, 3)
    assert np.all(np.array(sig) >= 0)
    sat = 0.001
    assert np.all(np.array(rgb) >= -sat - 1e-6)
    assert np.all(np.array(rgb) <= 1 + sat + 1e-6)
    # dir_net last layer is zero-init: rgb must not depend on dirs at init
    dirs2 = -dirs
    _, rgb2 = dec.apply(params, code, xyz, dirs2)
    np.testing.assert_allclose(np.array(rgb), np.array(rgb2), atol=1e-6)
    # density-only path agrees
    sig2, none_rgb = dec.apply(params, code, xyz, density_only=True)
    assert none_rgb is None
    np.testing.assert_allclose(np.array(sig), np.array(sig2), atol=1e-6)


def test_update_density_grid_and_bitfield():
    dec = TriPlaneDecoder(base_layers=(18, 64), density_layers=(64, 1),
                          color_layers=(64, 3), dir_layers=(16, 64))
    code = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 6, 8, 8))
    params = dec.init(jax.random.PRNGKey(0), code,
                      jnp.zeros((2, 8, 3)), jnp.zeros((2, 8, 3)))
    H = 8
    grid = jnp.zeros((2, H ** 3), jnp.float16)
    grid2, bf, mean_d = update_density_grid(
        dec, params, code, grid, jax.random.PRNGKey(5), H, density_thresh=0.1)
    assert grid2.shape == grid.shape and bf.shape == (2, H ** 3 // 8)
    assert float(mean_d) >= 0
    # bitfield must equal thresholding the updated grid
    thresh = min(float(mean_d), 0.1)
    occ = unpackbits(bf)
    np.testing.assert_array_equal(np.array(occ),
                                  np.array(grid2, np.float32) > thresh)
    # get_density runs the 8-step rebuild
    g, b = get_density(dec, params, code, jax.random.PRNGKey(6), H,
                       density_thresh=0.1, density_step=2)
    assert g.shape == (2, H ** 3) and b.shape == (2, H ** 3 // 8)


def test_render_with_real_decoder_end_to_end():
    """Full pipeline smoke: camera rays -> render -> finite outputs."""
    dec = TriPlaneDecoder(base_layers=(18, 64), density_layers=(64, 1),
                          color_layers=(64, 3), dir_layers=(16, 64),
                          max_steps=32)
    code = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (1, 3, 6, 8, 8))
    params = dec.init(jax.random.PRNGKey(0), code,
                      jnp.zeros((1, 8, 3)), jnp.zeros((1, 8, 3)))
    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = -2.5  # camera at z=-2.5 looking +z
    intr = np.array([[[20., 20., 8., 8.]]], np.float32)
    rays_o, rays_d = get_cam_rays(jnp.array(pose[None, None]),
                                  jnp.array(intr), 16, 16)
    rays_o = rays_o.reshape(1, -1, 3)
    rays_d = rays_d.reshape(1, -1, 3)
    _, bf = get_density(dec, params, code, jax.random.PRNGKey(2), 8,
                        density_step=2)
    out = volume_render(dec, params, code, rays_o, rays_d, bf, 8,
                        perturb_key=jax.random.PRNGKey(3))
    assert np.all(np.isfinite(np.array(out['image'])))
    assert out['image'].shape == (1, 256, 3)


def test_partial_density_update_tracks_full_update():
    """The stochastic partial update must (a) decay stale occupied voxels
    with the same EMA rule, (b) refresh occupied voxels it resamples, and
    (c) leave never-visited empty voxels untouched — converging to the same
    occupancy set as full sweeps on a stationary density field."""
    from ssdnerf_tpu.models.decoders.renderer import (
        update_density_grid, update_density_grid_partial)

    H = 64

    class BallDecoder(ConstDecoder):
        @nn.compact
        def __call__(self, code, xyzs, dirs=None, density_only=False,
                     deterministic=True):
            dummy = self.param('w', nn.initializers.ones, (1,))
            r = jnp.linalg.norm(xyzs, axis=-1)
            sig = jnp.where(r < 0.5, 20.0, 0.0) * dummy[0]
            return sig, None

    import flax.linen as nn_  # noqa: F401
    dec = BallDecoder()
    code = jnp.zeros((2, 3, 2, 4, 4))
    params = dec.init(jax.random.PRNGKey(0), code, jnp.zeros((2, 8, 3)))

    key = jax.random.PRNGKey(1)
    grid_f = jnp.zeros((2, H ** 3), jnp.float16)
    grid_p = jnp.zeros((2, H ** 3), jnp.float16)
    # one full sweep to seed both
    key, k = jax.random.split(key)
    grid_f, bf_f, _ = update_density_grid(dec, params, code, grid_f, k, H)
    grid_p, bf_p, _ = update_density_grid(dec, params, code, grid_p, k, H)
    for _ in range(6):
        key, k1, k2 = jax.random.split(key, 3)
        grid_f, bf_f, _ = update_density_grid(dec, params, code, grid_f,
                                              k1, H)
        grid_p, bf_p, _ = update_density_grid_partial(dec, params, code,
                                                      grid_p, k2, H)
    occ_f = np.asarray(grid_f) > 0.1
    occ_p = np.asarray(grid_p) > 0.1
    # same occupancy support (the ball), up to jitter at the boundary shell
    agree = (occ_f == occ_p).mean()
    assert agree > 0.99, agree
    # the partial path keeps the interior occupied
    r2 = _voxel_radii(H) ** 2
    interior = r2 < 0.4 ** 2
    assert np.asarray(grid_p)[:, interior].min() > 1.0


def _voxel_radii(H):
    lin = np.arange(H ** 3)
    coords = np.stack([lin // (H * H), (lin // H) % H, lin % H], -1)
    xyz = (coords - (H - 1) / 2.0) * (2.0 / H)
    return np.linalg.norm(xyz, axis=-1)


def test_march_slots_with_occupied_box():
    """Reduced-slot marching clipped to the occupied AABB reproduces the
    dense render when occupancy is confined to a small region."""
    from ssdnerf_tpu.ops.morton import packbits
    import flax.linen as nn

    class SlabDecoder(ConstDecoder):
        pass

    H = 16
    # occupancy: a z-slab at z in [0.25, 0.5] (voxel idx 10..11 of 16)
    occ = np.zeros((H, H, H), bool)
    occ[:, :, 10:12] = True
    grid = occ.reshape(-1).astype(np.float32)  # linear (x, y, z) order
    bf = np.array(packbits(jnp.array(grid[None]), 0.5))

    N = 32
    o = np.zeros((1, N, 3), np.float32)
    o[..., 2] = -2.0
    o[0, :, 0] = np.linspace(-0.6, 0.6, N)
    o[0, :, 1] = np.linspace(-0.3, 0.3, N)
    d = np.zeros((1, N, 3), np.float32)
    d[..., 2] = 1.0

    dec_dense = SlabDecoder(sigma=4.0, max_steps=128)
    params = dec_dense.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 2, 4, 4)),
                            jnp.zeros((1, 8, 3)), jnp.zeros((1, 8, 3)))
    code = jnp.zeros((1, 3, 2, 4, 4))
    out_a = volume_render(dec_dense, params, code, jnp.array(o), jnp.array(d),
                          jnp.array(bf), H, T_thresh=1e-6)

    class SlabDecoderSlots(SlabDecoder):
        march_slots: int = 48

    dec_slots = SlabDecoderSlots(sigma=4.0, max_steps=128)
    out_b = volume_render(dec_slots, params, code, jnp.array(o), jnp.array(d),
                          jnp.array(bf), H, T_thresh=1e-6)
    # same physical integral, different (but equally valid) stratification
    # (sample positions shift by up to one dt at the slab boundary)
    np.testing.assert_allclose(np.array(out_a['weights_sum']),
                               np.array(out_b['weights_sum']), atol=0.06)
    np.testing.assert_allclose(np.array(out_a['image']),
                               np.array(out_b['image']), atol=0.06)
    # rays missing the occupied box are exactly empty in both
    assert float(out_b['weights_sum'].min()) >= 0.0


def test_bg_radius_sphere_coords():
    """bg_radius > 0 routes sph_from_ray through the renderer: the output
    carries (theta, phi) of each ray's far background-sphere intersection
    (torch-ngp bg surface; the reference stores the attribute at
    base_volume_renderer.py:15-23 and ships the sph_from_ray kernel)."""
    class BgDecoder(ConstDecoder):
        bg_radius: float = 3.0

    dec = BgDecoder(sigma=1.0)
    params = dec.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 2, 4, 4)),
                      jnp.zeros((1, 4, 3)), jnp.zeros((1, 4, 3)))
    o = np.zeros((1, 4, 3), np.float32)
    o[..., 2] = -2.0
    d = np.tile(np.array([0.0, 0.0, 1.0], np.float32), (1, 4, 1))
    out = volume_render(dec, params, jnp.zeros((1, 3, 2, 4, 4)),
                        jnp.array(o), jnp.array(d), _full_bitfield(1, 8), 8)
    assert 'bg_coords' in out and out['bg_coords'].shape == (1, 4, 2)
    # +z rays from (0,0,-2) hit the r=3 sphere at (0,0,3): theta =
    # atan2(0, 3)/pi*2 - 1 = -1, phi = atan2(0, 0)/pi = 0
    np.testing.assert_allclose(np.asarray(out['bg_coords'][0, :, 0]), -1.0,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out['bg_coords'][0, :, 1]), 0.0,
                               atol=1e-5)
    # oracle: intersection point actually lies on the sphere
    from ssdnerf_tpu.ops import sph_from_ray
    b = np.sum(o * d, -1)
    c = np.sum(o * o, -1) - 9.0
    t = -b + np.sqrt(b * b - c)
    p = o + t[..., None] * d
    np.testing.assert_allclose(np.linalg.norm(p, axis=-1), 3.0, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(sph_from_ray(jnp.array(o), jnp.array(d), 3.0)),
        np.asarray(out['bg_coords']), atol=1e-6)
    # default bg_radius (-1) leaves the output surface unchanged
    dec0 = ConstDecoder(sigma=1.0)
    out0 = volume_render(dec0, params, jnp.zeros((1, 3, 2, 4, 4)),
                         jnp.array(o), jnp.array(d), _full_bitfield(1, 8), 8)
    assert 'bg_coords' not in out0
