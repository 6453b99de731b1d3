"""Tests for the auto-decoder stack: vectorized Adam, stage-1 training,
and the single-stage DiffusionNeRF step + all val paths."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from ssdnerf_tpu.models.autodecoders import (
    adam_init, adam_step, ray_sample, MultiSceneNeRF, DiffusionNeRF)
from synthetic import make_batch, TINY_MODEL_CFG, TINY_TRAIN_CFG, TINY_TEST_CFG


def test_adam_matches_torch():
    torch = pytest.importorskip('torch')
    rng = np.random.RandomState(0)
    x0 = rng.normal(size=(2, 5)).astype(np.float32)
    grads = [rng.normal(size=(2, 5)).astype(np.float32) for _ in range(4)]

    xt = torch.tensor(x0, requires_grad=True)
    opt = torch.optim.Adam([xt], lr=0.01)
    for g in grads:
        opt.zero_grad()
        xt.grad = torch.tensor(g)
        opt.step()

    xj = jnp.array(x0)
    st = adam_init(xj)
    for g in grads:
        xj, st = adam_step(xj, jnp.array(g), st, 0.01)
    np.testing.assert_allclose(np.array(xj), xt.detach().numpy(), atol=1e-6)
    assert int(st.step[0]) == 4


def test_adam_per_scene_lr():
    x = jnp.ones((2, 3))
    g = jnp.ones((2, 3))
    st = adam_init(x)
    x2, _ = adam_step(x, g, st, jnp.array([0.1, 0.0]))
    assert float(x2[0, 0]) < 1.0
    np.testing.assert_allclose(np.array(x2[1]), 1.0)


def test_ray_sample():
    S, V, h, w = 2, 3, 4, 4
    ro = jnp.arange(S * V * h * w * 3, dtype=jnp.float32).reshape(S, V, h, w, 3)
    o, d, t = ray_sample(ro, ro, ro, 10, key=jax.random.PRNGKey(0))
    assert o.shape == (2, 10, 3)
    np.testing.assert_allclose(np.array(o), np.array(d))
    # n_samples >= pixels: pass-through
    o2, _, _ = ray_sample(ro, ro, ro, 64, key=jax.random.PRNGKey(0))
    assert o2.shape == (2, 48, 3)


@pytest.fixture(scope='module')
def stage1_setup():
    cfg = dict(TINY_MODEL_CFG)
    cfg.pop('diffusion')
    cfg['type'] = 'MultiSceneNeRF'
    model = MultiSceneNeRF(cfg, train_cfg=dict(TINY_TRAIN_CFG),
                           test_cfg=dict(TINY_TEST_CFG))
    opt_cfg = dict(type='Adam', lr=1e-3, weight_decay=0.)
    state = model.init_state(jax.random.PRNGKey(0), opt_cfg)
    tx = model.make_optimizer(opt_cfg, None, 'decoder')
    return model, state, tx


def test_stage1_train_step_learns(stage1_setup):
    model, state, tx = stage1_setup
    data_np = make_batch(num_scenes=2, num_views=2, h=16, w=16)
    data = {k: jnp.asarray(v) for k, v in data_np.items()
            if k not in ('scene_name',)}
    cache = model.make_cache()
    rng = np.random.RandomState(0)
    scene_batch = cache.load(
        data_np['scene_id'],
        init_code_fn=lambda n: model.get_init_code_np(n, rng))

    step = jax.jit(lambda s, b, d, k: model.train_step(s, b, d, k, tx))
    psnrs = []
    key = jax.random.PRNGKey(1)
    for i in range(20):
        key, sub = jax.random.split(key)
        state, scene_batch, logs = step(state, scene_batch, data, sub)
        psnrs.append(float(logs['train_psnr']))
    assert np.isfinite(psnrs).all()
    assert psnrs[-1] > psnrs[0] + 1.0, psnrs  # PSNR improves by > 1 dB
    # cache round-trip
    cache.save(data_np['scene_id'], scene_batch['code_'], scene_batch['opt'],
               scene_batch['density_grid'], scene_batch['density_bitfield'])
    again = cache.load(data_np['scene_id'])
    np.testing.assert_allclose(np.array(again['code_']),
                               np.array(scene_batch['code_']), atol=1e-6)
    assert int(again['opt'].step[0]) == int(scene_batch['opt'].step[0])


def test_stage1_recon_val(stage1_setup):
    model, state, tx = stage1_setup
    data_np = make_batch(num_scenes=1, num_views=2, h=16, w=16)
    data = {k: jnp.asarray(v) for k, v in data_np.items()
            if k not in ('scene_name',)}
    model.test_cfg['n_inverse_steps'] = 4
    code, grid, bitfield, aux = model.val_inverse_code(
        state, data, jax.random.PRNGKey(2))
    assert code.shape == (1,) + model.code_size
    img, depth = model.render(state, code, bitfield, 16, 16,
                              data['cond_intrinsics'], data['cond_poses'])
    assert img.shape == (1, 2, 16, 16, 3)
    assert np.isfinite(np.array(img)).all()


@pytest.fixture(scope='module')
def diffnerf_setup():
    model = DiffusionNeRF(dict(TINY_MODEL_CFG),
                          train_cfg=dict(TINY_TRAIN_CFG),
                          test_cfg=dict(TINY_TEST_CFG))
    opt_cfgs = dict(
        diffusion=dict(type='Adam', lr=1e-4, weight_decay=0.),
        decoder=dict(type='Adam', lr=1e-3, weight_decay=0.))
    state = model.init_state(jax.random.PRNGKey(0), opt_cfgs)
    tx_diff = model.make_optimizer(opt_cfgs['diffusion'], None, 'diffusion')
    tx_dec = model.make_optimizer(opt_cfgs['decoder'], None, 'decoder')
    return model, state, tx_diff, tx_dec


def test_diffusion_nerf_train_step(diffnerf_setup):
    model, state, tx_diff, tx_dec = diffnerf_setup
    data_np = make_batch(num_scenes=2, num_views=2, h=16, w=16)
    data = {k: jnp.asarray(v) for k, v in data_np.items()
            if k not in ('scene_name',)}
    cache = model.make_cache()
    rng = np.random.RandomState(0)
    scene_batch = cache.load(
        data_np['scene_id'],
        init_code_fn=lambda n: model.get_init_code_np(n, rng))
    step = jax.jit(
        lambda s, b, d, k: model.train_step(s, b, d, k, tx_diff, tx_dec))
    key = jax.random.PRNGKey(1)
    for i in range(3):
        key, sub = jax.random.split(key)
        state, scene_batch, logs = step(state, scene_batch, data, sub)
    for k in ('loss_diffusion', 'loss_decoder', 'train_psnr', 'code_rms',
              'pixel_loss'):
        assert k in logs and np.isfinite(float(logs[k])), k
    # diffusion opt state advanced, scale-norm updated
    assert float(state['ddpm_loss'][0]) != 1.0


def test_diffusion_nerf_stage2_step(diffnerf_setup):
    model, state, tx_diff, tx_dec = diffnerf_setup
    code = 0.5 * jax.random.normal(jax.random.PRNGKey(3),
                                   (2,) + model.code_size)
    data = dict(scene_id=jnp.arange(2), code=code)
    state2, none_batch, logs = model.train_step(
        state, None, data, jax.random.PRNGKey(4), tx_diff, tx_dec)
    assert none_batch is None
    assert np.isfinite(float(logs['loss_diffusion']))


def test_val_uncond(diffnerf_setup):
    model, state, tx_diff, tx_dec = diffnerf_setup
    noise = jax.random.normal(jax.random.PRNGKey(5), (1,) + model.code_size)
    code, grid, bitfield = model.val_uncond(state, noise,
                                            jax.random.PRNGKey(6))
    assert code.shape == (1,) + model.code_size
    assert np.isfinite(np.array(code)).all()
    assert grid.shape == (1, model.grid_size ** 3)


def test_val_guide_and_optim(diffnerf_setup):
    model, state, tx_diff, tx_dec = diffnerf_setup
    data_np = make_batch(num_scenes=1, num_views=1, h=16, w=16)
    data = {k: jnp.asarray(v) for k, v in data_np.items()
            if k not in ('scene_name',)}
    code, grid, bitfield = model.val_step(state, data, jax.random.PRNGKey(7))
    assert code.shape == (1,) + model.code_size
    assert np.isfinite(np.array(code)).all()
    img, _ = model.render(state, code, bitfield, 16, 16,
                          data['cond_intrinsics'], data['cond_poses'])
    assert np.isfinite(np.array(img)).all()


def test_device_scene_cache_matches_host_cache():
    from ssdnerf_tpu.models.autodecoders import SceneCache, DeviceSceneCache
    from ssdnerf_tpu.models.autodecoders.base import SceneOptState
    rng = np.random.RandomState(0)
    kwargs = dict(cache_size=6, code_size=(3, 2, 4, 4), grid_size=8)
    host = SceneCache(**kwargs)
    dev = DeviceSceneCache(**kwargs)
    ids = np.array([1, 3])
    init_fn = lambda n: rng.RandomState if False else np.full(
        (n, 3, 2, 4, 4), 0.25, np.float32)
    b_h = host.load(ids, init_code_fn=init_fn)
    b_d = dev.load(ids, init_code_fn=init_fn)
    np.testing.assert_allclose(np.asarray(b_h['code_']),
                               np.asarray(b_d['code_']))
    # save a batch and reload
    code_ = jnp.asarray(rng.normal(size=(2, 3, 2, 4, 4)).astype(np.float32))
    opt = SceneOptState(m=code_ * 0.1, v=code_ ** 2,
                        step=jnp.array([5, 7], jnp.int32))
    grid = jnp.asarray(rng.uniform(0, 1, (2, 512)).astype(np.float16))
    bitf = jnp.asarray(rng.randint(0, 255, (2, 64)).astype(np.uint8))
    for c in (host, dev):
        c.save(ids, code_, opt, grid, bitf)
    a_h = host.load(ids)
    a_d = dev.load(ids)
    for k in ('code_', 'density_grid', 'density_bitfield'):
        np.testing.assert_allclose(np.asarray(a_h[k]), np.asarray(a_d[k]),
                                   atol=1e-6, err_msg=k)
    np.testing.assert_allclose(np.asarray(a_h['opt'].m),
                               np.asarray(a_d['opt'].m), atol=1e-6)
    assert np.array_equal(np.asarray(a_h['opt'].step),
                          np.asarray(a_d['opt'].step))
    # state_dict round trip between the two implementations
    dev2 = DeviceSceneCache(**kwargs)
    dev2.load_state_dict(host.state_dict())
    np.testing.assert_allclose(np.asarray(dev2.code_, np.float32),
                               host.code_.astype(np.float32))
    # reset / set_codes / write_scenes interface parity
    for c in (host, dev):
        c.set_codes(np.full((1,) + kwargs['code_size'], 0.5, np.float32))
        c.write_scenes([0], code_[:1], grid[:1], bitf[:1])
        c.reset()
        assert not c.seen_mask().any()
