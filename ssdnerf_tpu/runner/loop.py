"""Iteration-based training loop.

Owns what the reference delegates to mmgen's ``DynamicIterBasedRunner``
(/root/reference/lib/apis/train.py:102-199): the infinite data stream, the
per-iteration ``train_step`` call, hook dispatch, checkpointing and resume
with dataloader fast-forward.  The hot path is one jitted step per
iteration; host work is only the cache gather/scatter for the current batch
and hook bookkeeping.
"""
import glob
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from ..core.checkpoint import save_checkpoint, load_checkpoint


class Runner:
    def __init__(self, model, state, cache, data_loader, txs, work_dir,
                 max_iters, hooks=(), scene_names=None, rank=0, world_size=1,
                 seed=0, mesh=None, data_sharding=None, repl_sharding=None):
        self.model = model
        self.state = state
        self.cache = cache
        self.data_loader = data_loader
        self.txs = txs
        self.work_dir = work_dir
        self.max_iters = max_iters
        self.hooks = list(hooks)
        self.scene_names = scene_names
        self.rank = rank
        self.world_size = world_size
        self.iteration = 0
        self.last_log_vars = {}
        self.base_key = jax.random.PRNGKey(seed + rank * 1000003)
        self.mesh = mesh
        self.data_sharding = data_sharding
        self.repl_sharding = repl_sharding
        self._step = None
        self._init_rng = np.random.RandomState(seed + rank)
        os.makedirs(work_dir, exist_ok=True)
        self._log_file = os.path.join(work_dir, f'log_rank{rank}.txt')

    # ---------------------------------------------------------------- #
    def log_text(self, msg):
        line = f'[{time.strftime("%Y-%m-%d %H:%M:%S")}] {msg}'
        if self.rank == 0:
            print(line, flush=True)
        with open(self._log_file, 'a') as f:
            f.write(line + '\n')

    def invalidate_step(self):
        self._step = None

    # ---------------------------------------------------------------- #
    def _build_step(self, stage2):
        model = self.model
        from ..models.autodecoders import DiffusionNeRF

        if isinstance(model, DiffusionNeRF):
            tx_diff = self.txs['diffusion']
            tx_dec = self.txs.get('decoder', tx_diff)

            def step(state, scene_batch, data, key):
                return model.train_step(state, scene_batch, data, key,
                                        tx_diff, tx_dec)
        else:
            tx_dec = self.txs['decoder']

            def step(state, scene_batch, data, key):
                return model.train_step(state, scene_batch, data, key, tx_dec)

        if stage2:
            def stage2_step(s, d, k):
                new_s, _, logs = step(s, None, d, k)
                return new_s, logs
            if self.mesh is not None:
                # replicated model state, scene-sharded data batch: XLA
                # turns the UNet gradient means into ICI psums
                from jax.sharding import NamedSharding, PartitionSpec as P
                repl = NamedSharding(self.mesh, P())
                shard = NamedSharding(self.mesh, P(self.mesh.axis_names[0]))
                return jax.jit(stage2_step, in_shardings=(repl, shard, repl),
                               donate_argnums=(0,))
            return jax.jit(stage2_step, donate_argnums=(0,))
        from ..models.autodecoders.multiscene import DeviceSceneCache
        if self.mesh is not None:
            from ..parallel.sharding import (make_parallel_train_step,
                                             make_parallel_bank_step)
            if isinstance(self.cache, DeviceSceneCache):
                # mesh-sharded bank: fused donated gather+train+scatter
                self._parallel_compile = make_parallel_bank_step(
                    model, self.txs, self.mesh)
            else:
                self._parallel_compile = make_parallel_train_step(
                    model, self.txs, self.mesh)
            return None  # compiled lazily against the first sharded inputs
        if isinstance(self.cache, DeviceSceneCache):
            # Fused bank step: row gather + train_step + row scatter in ONE
            # jit with the whole HBM scene bank donated — the scatter lowers
            # to an in-place dynamic-update-slice instead of a bank copy,
            # and the gather/scatter fuse into the step's schedule (no
            # extra dispatches).  The reference pays a CPU<->GPU cache
            # round-trip here every iteration (multiscene_nerf.py:71-183).
            gather = DeviceSceneCache.gather_rows
            scatter = DeviceSceneCache.scatter_rows

            def bank_step(bank, state, idx, data, key):
                scene_batch = gather(bank, idx)
                state, scene_batch, logs = step(state, scene_batch, data, key)
                return scatter(bank, idx, scene_batch), state, logs
            return jax.jit(bank_step, donate_argnums=(0, 1))
        # state + scene batch buffers are donated (EMA params are distinct
        # copies since init, so no double-donation)
        return jax.jit(step, donate_argnums=(0, 1))

    def _prepare_data(self, batch):
        data = {}
        for k in ('cond_imgs', 'cond_poses', 'cond_intrinsics'):
            if k in batch:
                data[k] = jnp.asarray(batch[k])
        if 'code' in batch:
            blob = batch['code']
            if 'code' in blob:
                data['code'] = jnp.asarray(blob['code'], jnp.float32)
            elif 'code_' in blob:
                data['code'] = self.model.code_activation(
                    jnp.asarray(blob['code_'], jnp.float32),
                    self.state.get('code_act'))
        data['scene_id'] = jnp.asarray(batch['scene_id'])
        return data

    # ---------------------------------------------------------------- #
    def run(self):
        for hook in self.hooks:
            hook.before_run(self)
        stage2 = 'optimizer' not in self.model.train_cfg
        loader = iter(self.data_loader)
        self.log_text(
            f'Starting training at iter {self.iteration}/{self.max_iters} '
            f'(rank {self.rank}/{self.world_size}, stage2={stage2})')
        model = self.model
        while self.iteration < self.max_iters:
            batch = next(loader)
            data = self._prepare_data(batch)
            key = jax.random.fold_in(self.base_key, self.iteration)
            if self._step is None:
                self._step = self._build_step(stage2)
            if stage2:
                if self.mesh is not None:
                    from ..parallel.sharding import replicate, shard_scenes
                    data = shard_scenes(data, self.mesh)
                    if not getattr(self, '_state_sharded', False):
                        self.state = replicate(self.state, self.mesh)
                        self._state_sharded = True
                    key = replicate(key, self.mesh)
                self.state, log_vars = self._step(self.state, data, key)
            elif self.cache is not None and hasattr(self.cache, 'bank'):
                # DeviceSceneCache: fused donated bank step (gather + train
                # + scatter in one jit; mesh-sharded bank when mesh given)
                idx = self.cache.ensure_init(
                    batch['scene_id'],
                    init_code_fn=lambda n: model.get_init_code_np(
                        n, self._init_rng,
                        np.asarray(self.state['init_code'])
                        if self.state.get('init_code') is not None else None))
                bank = self.cache.bank()
                if self.mesh is not None:
                    from ..parallel.sharding import replicate, shard_scenes
                    data = shard_scenes(data, self.mesh)
                    idx = replicate(idx, self.mesh)
                    key = replicate(key, self.mesh)
                    if not getattr(self, '_state_sharded', False):
                        self.state = replicate(self.state, self.mesh)
                        self._state_sharded = True
                    if self._step is None:
                        self._step = self._parallel_compile(
                            bank, self.state, idx, data, key)
                bank, self.state, log_vars = self._step(
                    bank, self.state, idx, data, key)
                self.cache.set_bank(bank)
                self.cache.mark_seen(batch['scene_id'])
            elif self.cache is not None:
                scene_batch = self.cache.load(
                    batch['scene_id'],
                    init_code_fn=lambda n: model.get_init_code_np(
                        n, self._init_rng,
                        np.asarray(self.state['init_code'])
                        if self.state.get('init_code') is not None else None))
                if self.mesh is not None:
                    from ..parallel.sharding import replicate, shard_scenes
                    scene_batch = shard_scenes(scene_batch, self.mesh)
                    data = shard_scenes(data, self.mesh)
                    if not getattr(self, '_state_sharded', False):
                        self.state = replicate(self.state, self.mesh)
                        self._state_sharded = True
                    key = replicate(key, self.mesh)
                    if self._step is None:
                        self._step = self._parallel_compile(
                            self.state, scene_batch, data, key)
                self.state, scene_batch, log_vars = self._step(
                    self.state, scene_batch, data, key)
                self.cache.save(batch['scene_id'], scene_batch['code_'],
                                scene_batch['opt'],
                                scene_batch['density_grid'],
                                scene_batch['density_bitfield'])
            else:
                # filesystem cache mode (multiscene_nerf.py:56-69,139-183):
                # per-scene state rides the data batch; results are written
                # back to train_cfg.save_dir by background writers.
                scene_batch = self._scene_batch_from_data(batch)
                self.state, scene_batch, log_vars = self._step(
                    self.state, scene_batch, data, key)
                self._save_scene_files(batch, scene_batch)
            self.last_log_vars = log_vars
            self.iteration += 1  # = number of completed iterations
            for hook in self.hooks:
                hook.after_train_iter(self)
        for hook in self.hooks:
            hook.after_run(self)

    # ---------------------------------------------------------------- #
    # filesystem cache mode helpers
    # ---------------------------------------------------------------- #
    def _scene_batch_from_data(self, batch):
        import jax.numpy as jnp
        from ..models.autodecoders.base import SceneOptState
        model = self.model
        S = len(batch['scene_id'])
        cs = model.code_size
        gs = model.grid_size
        blob = batch.get('code')
        if blob and 'code_' in blob:
            code_ = jnp.asarray(blob['code_'], jnp.float32)
            grid = jnp.asarray(blob['density_grid'])
            bitfield = jnp.asarray(blob['density_bitfield'])
            m = jnp.asarray(blob.get('optimizer_m',
                                     np.zeros((S,) + cs)), jnp.float32)
            v = jnp.asarray(blob.get('optimizer_v',
                                     np.zeros((S,) + cs)), jnp.float32)
            step = jnp.asarray(blob.get('optimizer_step', np.zeros(S)),
                               jnp.int32)
        else:
            code_ = jnp.asarray(self.model.get_init_code_np(
                S, self._init_rng,
                np.asarray(self.state['init_code'])
                if self.state.get('init_code') is not None else None))
            grid = jnp.zeros((S, gs ** 3), jnp.float16)
            bitfield = jnp.zeros((S, gs ** 3 // 8), jnp.uint8)
            m = jnp.zeros_like(code_)
            v = jnp.zeros_like(code_)
            step = jnp.zeros((S,), jnp.int32)
        return dict(code_=code_, opt=SceneOptState(m=m, v=v, step=step),
                    density_grid=grid, density_bitfield=bitfield)

    def _save_scene_files(self, batch, scene_batch):
        save_dir = self.model.train_cfg.get('save_dir')
        if save_dir is None:
            return
        os.makedirs(save_dir, exist_ok=True)
        if not hasattr(self, '_writer_pool'):
            from concurrent.futures import ThreadPoolExecutor
            n = max(1, getattr(self.model, 'num_file_writers', 1) or 1)
            self._writer_pool = ThreadPoolExecutor(max_workers=n)
        code_ = np.asarray(scene_batch['code_'])
        m = np.asarray(scene_batch['opt'].m)
        v = np.asarray(scene_batch['opt'].v)
        step = np.asarray(scene_batch['opt'].step)
        grid = np.asarray(scene_batch['density_grid'])
        bitfield = np.asarray(scene_batch['density_bitfield'])
        for i, name in enumerate(batch['scene_name']):
            path = os.path.join(save_dir, name + '.npz')
            self._writer_pool.submit(
                np.savez, path, scene_id=int(batch['scene_id'][i]),
                scene_name=name, code_=code_[i], density_grid=grid[i],
                density_bitfield=bitfield[i], optimizer_m=m[i],
                optimizer_v=v[i], optimizer_step=step[i])

    # ---------------------------------------------------------------- #
    def ckpt_path(self, iteration=None):
        it = self.iteration if iteration is None else iteration
        return os.path.join(self.work_dir, 'ckpt', f'iter_{it}.ckpt')

    def save_checkpoint(self):
        path = self.ckpt_path()
        save_checkpoint(path, self.state, self.iteration,
                        meta=dict(rank=self.rank))
        latest = os.path.join(self.work_dir, 'ckpt', 'latest.ckpt')
        try:
            if os.path.islink(latest) or os.path.exists(latest):
                os.remove(latest)
            os.symlink(os.path.basename(path), latest)
        except OSError:
            pass
        if self.cache is not None:
            # versioned per checkpoint: an unversioned shared file lets a
            # LATER save silently re-pair an older checkpoint with the
            # newest bank on resume (caught by the round-5 soak bisect,
            # where iter_2500.ckpt resumed with the iter-5000 bank)
            np.savez(os.path.join(
                self.work_dir, 'ckpt',
                f'iter_{self.iteration}_cache_rank{self.rank}.npz'),
                **self.cache.state_dict())
        self.log_text(f'Saved checkpoint to {path}')

    def prune_checkpoints(self, keep):
        ckpts = sorted(
            glob.glob(os.path.join(self.work_dir, 'ckpt', 'iter_*.ckpt')),
            key=lambda p: int(os.path.basename(p)[5:-5]))
        for p in ckpts[:-keep]:
            os.remove(p)
            base = os.path.basename(p)[:-5]
            for c in glob.glob(os.path.join(
                    os.path.dirname(p), f'{base}_cache_rank*.npz')):
                os.remove(c)

    def resume(self, path):
        state, iteration, _ = load_checkpoint(path, template=self.state)
        merged = dict(self.state)
        merged.update(state)
        self.state = merged
        self.iteration = iteration
        base = os.path.basename(path)
        cache_path = os.path.join(
            os.path.dirname(path),
            f'{base[:-5]}_cache_rank{self.rank}.npz' if base != 'latest.ckpt'
            else f'iter_{iteration}_cache_rank{self.rank}.npz')
        if not os.path.exists(cache_path):  # pre-round-5 layout
            cache_path = os.path.join(os.path.dirname(path),
                                      f'cache_rank{self.rank}.npz')
        if self.cache is not None and os.path.exists(cache_path):
            self.cache.load_state_dict(dict(np.load(cache_path)))
        # fast-forward the deterministic batch order so the resumed run
        # continues the exact sequence an uninterrupted run would see
        # (reference: sampler.skip_iter, lib/apis/train.py:188-196)
        if hasattr(self.data_loader, 'skip_iters'):
            self.data_loader.skip_iters(iteration)
        self.log_text(f'Resumed from {path} at iter {iteration}')
