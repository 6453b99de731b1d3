"""Training orchestration API.

Equivalent of ``train_model`` (/root/reference/lib/apis/train.py:22-199):
build dataloaders, optimizers, hooks and the runner from a config, then run.
Distribution: data parallelism over a TPU mesh replaces DDP/NCCL; per-host
rank sharding of the scene cache mirrors ``split_data``.
"""
import os

import numpy as np
import jax

from ..data.builder import build_dataset, DataLoader
from ..registry import build_model
from ..runner.optim import build_optimizers
from ..runner.hooks import build_hooks, CheckpointHook, TextLoggerHook, \
    SaveStatsHook
from ..runner.loop import Runner
from ..core.evaluation import build_metric, GenerativeEvalHook3D


def build_model_from_cfg(cfg):
    return build_model(cfg.model, train_cfg=cfg.get('train_cfg'),
                       test_cfg=cfg.get('test_cfg'))


def load_cache_from_dir(cache, cache_dir, scene_names):
    """Preload the scene cache from per-scene files (the reference's
    ``cache_load_from``, multiscene_nerf.py:78-94)."""
    if cache_dir is None or not os.path.isdir(cache_dir):
        return False
    files = sorted(os.listdir(cache_dir))
    if not files:
        return False
    loaded = 0
    # Stage rows on host then upload once: state_dict() aliases the host
    # SceneCache's arrays (in-place) and round-trips the DeviceSceneCache
    # bank through one bulk load_state_dict instead of per-row device
    # scatters (jnp arrays do not support item assignment).
    sd = cache.state_dict()
    for li in range(cache.local_size):
        gid = cache.offset + li
        name = scene_names[gid] if scene_names else f'{gid:06d}'
        for ext in ('.npz',):
            path = os.path.join(cache_dir, name + ext)
            if os.path.exists(path):
                d = np.load(path)
                sd['code_'][li] = d['code_'].astype(sd['code_'].dtype)
                sd['density_grid'][li] = d['density_grid']
                sd['density_bitfield'][li] = d['density_bitfield']
                if 'optimizer_m' in d:
                    sd['m'][li] = d['optimizer_m'].astype(sd['m'].dtype)
                    sd['v'][li] = d['optimizer_v'].astype(sd['v'].dtype)
                    sd['step'][li] = d['optimizer_step']
                sd['seen'][li] = True
                loaded += 1
                break
    if loaded:
        cache.load_state_dict(sd)
    return loaded > 0


def train_model(cfg, work_dir=None, resume_from=None, seed=0, rank=0,
                world_size=1, max_iters=None):
    work_dir = work_dir or cfg.get('work_dir', './work_dir')
    model = build_model_from_cfg(cfg)

    dataset = build_dataset(cfg.data['train'])
    scene_names = [dataset.scene_name(i) for i in range(len(dataset))]

    loader_cfg = dict(cfg.data.get('train_dataloader', {}))
    loader = DataLoader(
        dataset, batch_size=cfg.data.get('samples_per_gpu', 8),
        rank=rank, world_size=world_size,
        num_workers=loader_cfg.get('num_workers',
                                   cfg.data.get('workers_per_gpu', 0)),
        split_data=loader_cfg.get('split_data', True), seed=seed,
        # batch overlap corrupts optimizer state with in-flight filesystem
        # cache writes -> hard error in that mode (distributed_sampler.py:72)
        strict_disjoint=getattr(model, 'num_file_writers', 0) > 0)

    txs, schedules = build_optimizers(model, cfg.get('optimizer', {}),
                                     cfg.get('lr_config'),
                                     max_iters=cfg.get('total_iters'))
    state = model.init_state(jax.random.PRNGKey(seed),
                             cfg.get('optimizer', {}),
                             lr_schedules=schedules) \
        if hasattr(model, 'diffusion') else model.init_state(
            jax.random.PRNGKey(seed),
            cfg.get('optimizer', {}).get('decoder'),
            schedules.get('decoder'))

    # model.pretrained / cfg.load_from: load matching param groups from an
    # existing checkpoint (base_nerf.py:124-125 / mmcv load_from semantics)
    for ckpt_path in (cfg.model.get('pretrained'), cfg.get('load_from')):
        if ckpt_path and os.path.isfile(ckpt_path):
            from ..core.checkpoint import load_checkpoint
            loaded, _, _ = load_checkpoint(ckpt_path)
            n = 0
            for k in list(state.keys()):
                if k in loaded and not k.startswith('opt_'):
                    from flax import serialization
                    state[k] = serialization.from_state_dict(
                        state[k], loaded[k]) if state[k] is not None \
                        else loaded[k]
                    n += 1
            print(f'Loaded {n} state groups from {ckpt_path}')

    # local device mesh first: the scene-cache bank shards over it
    mesh = None
    n_local = jax.local_device_count()
    if n_local > 1 and cfg.data.get('samples_per_gpu', 8) % n_local == 0:
        from ..parallel import make_mesh
        mesh = make_mesh(n_local)
        print(f'Data-parallel over {n_local} local devices.')

    cache = model.make_cache(rank, world_size, mesh=mesh) \
        if model.cache_size > 0 else None
    if cache is not None:
        cache_load_from = model.train_cfg.get('cache_load_from')
        if load_cache_from_dir(cache, cache_load_from, scene_names):
            print(f'Loaded cache files from {cache_load_from}.')
        else:
            print('Initialize codes from scratch.')

    # hooks
    hooks = build_hooks(cfg.get('custom_hooks', []))
    ckpt_cfg = dict(cfg.get('checkpoint_config', {}))
    hooks.append(CheckpointHook(
        interval=ckpt_cfg.get('interval', 5000),
        max_keep_ckpts=ckpt_cfg.get('max_keep_ckpts', -1)))
    log_cfg = dict(cfg.get('log_config', {}))
    hooks.append(TextLoggerHook(interval=log_cfg.get('interval', 50)))
    hooks.append(SaveStatsHook(interval=log_cfg.get('interval', 50)))
    for ev in cfg.get('evaluation', []):
        ev = dict(ev)
        assert ev.pop('type') == 'GenerativeEvalHook3D'
        data_key = ev.pop('data')
        val_dataset = build_dataset(cfg.data[data_key]) if rank == 0 else None
        metric_cfg = ev.pop('metrics', None)
        metrics = [build_metric(metric_cfg)] if metric_cfg else []
        hooks.append(GenerativeEvalHook3D(
            dataset=val_dataset, metrics=metrics, **ev))
    hooks.sort(key=lambda h: h.priority)

    runner = Runner(
        model, state, cache, loader, txs, work_dir,
        max_iters=max_iters or cfg.get('total_iters', 1000000),
        hooks=hooks, scene_names=scene_names, rank=rank,
        world_size=world_size, seed=seed, mesh=mesh)
    if resume_from:
        runner.resume(resume_from)
    runner.run()
    return runner
