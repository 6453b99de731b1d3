"""Multi-device tests: data-parallel train step over an 8-device CPU mesh,
parity with the single-device step, and the driver dryrun entry."""
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ssdnerf_tpu.models.autodecoders import DiffusionNeRF
from ssdnerf_tpu.models.autodecoders.base import adam_init
from ssdnerf_tpu.parallel import (make_mesh, replicate, shard_scenes,
                                  make_parallel_train_step)
from synthetic import make_batch, TINY_MODEL_CFG, TINY_TRAIN_CFG, TINY_TEST_CFG


pytestmark = pytest.mark.skipif(jax.device_count() < 8,
                                reason='needs 8 virtual devices')


def _setup(num_scenes=8):
    model = DiffusionNeRF(dict(TINY_MODEL_CFG),
                          train_cfg=dict(TINY_TRAIN_CFG, extra_scene_step=1),
                          test_cfg=dict(TINY_TEST_CFG))
    opt_cfgs = dict(diffusion=dict(type='Adam', lr=1e-4),
                    decoder=dict(type='Adam', lr=1e-3))
    state = model.init_state(jax.random.PRNGKey(0), opt_cfgs)
    txs = dict(
        diffusion=model.make_optimizer(opt_cfgs['diffusion'], None, 'd'),
        decoder=model.make_optimizer(opt_cfgs['decoder'], None, 'd'))
    data_np = make_batch(num_scenes=num_scenes, num_views=2, h=16, w=16)
    data = {k: jnp.asarray(v) for k, v in data_np.items()
            if k != 'scene_name'}
    rng = np.random.RandomState(0)
    code_ = jnp.asarray(model.get_init_code_np(num_scenes, rng))
    scene_batch = dict(
        code_=code_, opt=adam_init(code_),
        density_grid=jnp.zeros((num_scenes, model.grid_size ** 3),
                               jnp.float16),
        density_bitfield=jnp.full(
            (num_scenes, model.grid_size ** 3 // 8), 255, jnp.uint8))
    return model, state, txs, scene_batch, data


def test_parallel_step_runs_and_matches_semantics():
    model, state, txs, scene_batch, data = _setup()
    key = jax.random.PRNGKey(1)

    # single-device result
    single = jax.jit(lambda s, b, d, k: model.train_step(
        s, b, d, k, txs['diffusion'], txs['decoder']))
    s1, b1, logs1 = single(state, scene_batch, data, key)

    mesh = make_mesh(8)
    state_r = replicate(state, mesh)
    batch_s = shard_scenes(scene_batch, mesh)
    data_s = shard_scenes(data, mesh)
    key_r = replicate(key, mesh)
    step = make_parallel_train_step(model, txs, mesh)(
        state_r, batch_s, data_s, key_r)
    s8, b8, logs8 = step(state_r, batch_s, data_s, key_r)

    # one logical program: results must match the single-device run exactly
    # (same global batch, same rng)
    # (tolerances allow cross-device reduction-order float differences)
    np.testing.assert_allclose(float(logs8['loss_diffusion']),
                               float(logs1['loss_diffusion']), rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(b8['code_']), np.asarray(b1['code_']), atol=1e-3)
    # params stayed replicated (no divergence across devices)
    leaf8 = jax.tree_util.tree_leaves(s8['diffusion'])[0]
    leaf1 = jax.tree_util.tree_leaves(s1['diffusion'])[0]
    np.testing.assert_allclose(np.asarray(leaf8), np.asarray(leaf1),
                               atol=1e-3)
    # scene state is actually sharded over the mesh
    shard_devs = {s.device for s in b8['code_'].addressable_shards}
    assert len(shard_devs) == 8


def test_graft_dryrun_multichip():
    import importlib
    mod = importlib.import_module('__graft_entry__')
    mod.dryrun_multichip(8)


def test_train_model_with_mesh(tmp_path):
    """train_model picks up the 8-device mesh automatically."""
    import cv2  # noqa: F401  (dataset writer dependency)
    from ssdnerf_tpu.config import Config
    from ssdnerf_tpu.apis import train_model
    from test_pipeline import _write_srn_scene
    root = str(tmp_path / 'srn')
    for i in range(8):
        _write_srn_scene(root, f'scene{i:03d}', seed=i)
    cfg = Config._wrap(dict(
        model=dict(TINY_MODEL_CFG, cache_size=8),
        train_cfg=dict(TINY_TRAIN_CFG, extra_scene_step=1),
        test_cfg=dict(TINY_TEST_CFG),
        optimizer=dict(
            diffusion=dict(type='Adam', lr=1e-4, weight_decay=0.),
            decoder=dict(type='Adam', lr=1e-3, weight_decay=0.)),
        data=dict(
            samples_per_gpu=8,
            train=dict(type='ShapeNetSRN', data_prefix=root),
            train_dataloader=dict(split_data=True)),
        lr_config=dict(policy='Fixed'),
        checkpoint_config=dict(interval=0),
        log_config=dict(interval=1),
        total_iters=2,
        custom_hooks=[]))
    runner = train_model(cfg, work_dir=str(tmp_path / 'wd'), max_iters=2)
    assert runner.mesh is not None
    assert runner.iteration == 2
    assert np.isfinite(float(runner.last_log_vars['loss_diffusion']))
    # the scene-cache bank is sharded over all mesh devices, not parked on
    # device 0
    if hasattr(runner.cache, 'code_'):
        devs = {s.device for s in runner.cache.code_.addressable_shards}
        assert len(devs) == 8, devs


def test_device_cache_mesh_sharding_roundtrip():
    """Sharded bank: load/save round-trips and shards span the mesh."""
    from ssdnerf_tpu.models.autodecoders.multiscene import DeviceSceneCache
    from ssdnerf_tpu.parallel import make_mesh
    from ssdnerf_tpu.models.autodecoders.base import SceneOptState
    mesh = make_mesh(8)
    cache = DeviceSceneCache(10, (3, 2, 4, 4), 16, cache_16bit=False,
                             mesh=mesh)
    assert cache._bank_size % 8 == 0
    assert len({s.device for s in cache.code_.addressable_shards}) == 8
    rng = np.random.RandomState(0)
    ids = np.array([1, 4, 7])
    code = jnp.asarray(rng.randn(3, 3, 2, 4, 4).astype(np.float32))
    opt = SceneOptState(m=jnp.zeros_like(code), v=jnp.ones_like(code),
                        step=jnp.ones((3,), jnp.int32))
    grid = jnp.asarray(rng.rand(3, 16 ** 3).astype(np.float16))
    bf = jnp.zeros((3, 16 ** 3 // 8), jnp.uint8)
    cache.save(ids, code, opt, grid, bf)
    out = cache.load(ids)
    np.testing.assert_allclose(np.asarray(out['code_']), np.asarray(code),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(out['density_grid']),
                               np.asarray(grid))
    sd = cache.state_dict()
    assert sd['code_'].shape[0] == 10  # unpadded in checkpoints
    cache2 = DeviceSceneCache(10, (3, 2, 4, 4), 16, mesh=mesh)
    cache2.load_state_dict(sd)
    out2 = cache2.load(ids)
    np.testing.assert_allclose(np.asarray(out2['code_']), np.asarray(code),
                               atol=1e-6)


def test_sharded_volume_render_matches_single_device():
    """Ray-axis sharding over the mesh: identical output to unsharded."""
    import jax.numpy as jnp
    from ssdnerf_tpu.models import TriPlaneDecoder
    from ssdnerf_tpu.models.decoders.renderer import volume_render
    from ssdnerf_tpu.parallel.sharding import (make_mesh,
                                               sharded_volume_render)
    from ssdnerf_tpu.ops import packbits

    rng = np.random.RandomState(0)
    S, N, grid = 2, 256, 64
    code = 0.3 * jnp.asarray(rng.randn(S, 3, 6, 128, 128).astype(np.float32))
    occ = (rng.rand(S, grid ** 3) < 0.3).astype(np.float32)
    bitfield = packbits(jnp.asarray(occ), 0.5)
    o = rng.randn(S, N, 3).astype(np.float32) * 0.2
    o[..., 2] += 2.2
    d = -o + rng.randn(S, N, 3).astype(np.float32) * 0.3
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)

    dec = TriPlaneDecoder()
    params = dec.init(jax.random.PRNGKey(1), code[:1], jnp.zeros((1, 8, 3)),
                      jnp.zeros((1, 8, 3)))
    mesh = make_mesh(8)

    ref = volume_render(dec, params, code, o, d, bitfield, grid)
    out = sharded_volume_render(dec, params, code, o, d, bitfield, grid,
                                mesh)
    # per-shard matmul shapes differ from the monolithic ones, so bf16
    # accumulation order differs slightly
    for k in ('weights_sum', 'depth', 'image'):
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   atol=2e-3, err_msg=k)


def test_parallel_bank_step_fused_and_donated():
    """Mesh-sharded bank + fused gather/train/scatter in ONE donated jit
    (VERDICT r4 #6): semantics match the plain parallel step, and
    memory_analysis proves the multi-GB bank is updated in place (no
    bank-sized temp/output beyond the donated buffers)."""
    from ssdnerf_tpu.models.autodecoders.multiscene import DeviceSceneCache
    from ssdnerf_tpu.parallel import make_parallel_bank_step

    model, state, txs, scene_batch, data = _setup()
    mesh = make_mesh(8)
    S = 8
    cache = DeviceSceneCache(16, model.code_size, model.grid_size,
                             cache_16bit=False, mesh=mesh)
    ids = np.arange(S)
    cache.save(ids, scene_batch['code_'], scene_batch['opt'],
               scene_batch['density_grid'].astype(jnp.float16),
               scene_batch['density_bitfield'])

    state_r = replicate(state, mesh)
    # device_put may alias buffers it does not need to move and state_r is
    # donated below — keep pristine copies for the comparison step
    state_keep = jax.tree_util.tree_map(lambda a: jnp.array(a), state_r)
    data_s = shard_scenes(data, mesh)
    key = replicate(jax.random.PRNGKey(1), mesh)
    idx = replicate(jnp.asarray(ids), mesh)
    bank = cache.bank()

    compile_for = make_parallel_bank_step(model, txs, mesh)
    step = compile_for(bank, state_r, idx, data_s, key)
    bank2, state2, logs = step(bank, state_r, idx, data_s, key)
    assert np.isfinite(float(logs['loss_diffusion']))
    assert np.isfinite(float(logs['train_psnr']))

    # parity with the unfused parallel step on identical inputs
    cache2 = DeviceSceneCache(16, model.code_size, model.grid_size,
                              cache_16bit=False, mesh=mesh)
    cache2.save(ids, scene_batch['code_'], scene_batch['opt'],
                scene_batch['density_grid'].astype(jnp.float16),
                scene_batch['density_bitfield'])
    sb = cache2.load(ids)
    sb = shard_scenes(sb, mesh)
    state_r2 = state_keep
    pstep = make_parallel_train_step(model, txs, mesh)(
        state_r2, sb, data_s, key)
    state3, sb3, logs3 = pstep(state_r2, sb, data_s, key)
    np.testing.assert_allclose(float(logs['loss_diffusion']),
                               float(logs3['loss_diffusion']), rtol=1e-5)
    cache2.save(ids, sb3['code_'], sb3['opt'], sb3['density_grid'],
                sb3['density_bitfield'])
    cache.set_bank(bank2)
    np.testing.assert_allclose(np.asarray(cache.load(ids)['code_']),
                               np.asarray(cache2.load(ids)['code_']),
                               atol=1e-5)

    # donation proof on a bank big enough to dominate the step's temps:
    # the donated bank buffers must be ALIASED into the outputs (updated
    # in place), so alias bytes >= bank bytes and the fresh allocation
    # (output + temp - alias) stays far below the bank size.
    big = DeviceSceneCache(8192, model.code_size, model.grid_size,
                           cache_16bit=False, mesh=mesh)
    big_bank = big.bank()
    bank_bytes = sum(int(v.nbytes) for v in big_bank.values())
    state_f = jax.tree_util.tree_map(lambda a: jnp.array(a), state2)
    ma = compile_for(big_bank, state_f, idx, data_s, key) \
        .lower(big_bank, state_f, idx, data_s, key).compile() \
        .memory_analysis()
    if ma is not None:
        per_dev = bank_bytes / 8  # memory_analysis reports per device
        assert ma.alias_size_in_bytes >= 0.9 * per_dev, (
            f'aliased {ma.alias_size_in_bytes} < bank {per_dev}/device — '
            f'the donated bank is not updated in place')
        fresh = (ma.output_size_in_bytes + ma.temp_size_in_bytes
                 - ma.alias_size_in_bytes)
        assert fresh < 0.5 * per_dev, (
            f'fused bank step allocates {fresh} fresh bytes vs bank '
            f'{per_dev}/device — donation/aliasing is not working')
