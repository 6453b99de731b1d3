"""Multi-scene auto-decoder: scene cache + stage-1 training.

TPU-native re-design of ``MultiSceneNeRF``
(/root/reference/lib/models/autodecoders/multiscene_nerf.py):

- The per-scene cache (code_, Adam moments, density grid/bitfield) is a
  host-resident numpy store sharded by rank (contiguous ``split_data``
  partitioning, distributed_sampler.py:28-41), with fp16 code / bf16 moment
  variants (``cache_16bit``, multiscene_nerf.py:131-183).  Batch slices move
  host<->device once per outer iteration; the whole inner loop runs on
  device in a single jitted step.
- ``train_step`` (multiscene_nerf.py:185-252) is one jitted function:
  inverse_code scan + joint decoder/code update.
"""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import ml_dtypes

from ..code_activations import build_code_activation
from ..losses import build_pixel_loss, build_reg_loss
from ..decoders.triplane import TriPlaneDecoder
from ..decoders.renderer import update_density_grid
from ...ops import get_cam_rays
from .base import (SceneOptState, adam_init, adam_step, ray_sample,
                   rendering_loss, inverse_code, render_views)


def build_decoder(cfg):
    cfg = dict(cfg)
    kind = cfg.pop('type', 'TriPlaneDecoder')
    assert kind == 'TriPlaneDecoder', kind
    for k in ('base_layers', 'density_layers', 'color_layers', 'dir_layers',
              'scene_base_size', 'scene_rand_dims'):
        if cfg.get(k) is not None:
            cfg[k] = tuple(cfg[k])
    return TriPlaneDecoder(**cfg)


def psnr(pred, target, axis=None):
    mse = jnp.mean((pred - target) ** 2, axis=axis)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-10))


class SceneCache:
    """Host-side per-scene state store for this process's scene shard.

    Layout mirrors the reference cache entries {code_, density_grid,
    density_bitfield, optimizer(m, v, step)} (multiscene_nerf.py:146-155).
    """

    def __init__(self, cache_size, code_size, grid_size, cache_16bit=False,
                 rank=0, world_size=1):
        split = np.round(np.linspace(0, cache_size, world_size + 1)).astype(int)
        self.offset = int(split[rank])
        self.local_size = int(split[rank + 1] - split[rank])
        self.cache_size = cache_size
        self.code_size = tuple(code_size)
        self.grid_size = grid_size
        code_dtype = np.float16 if cache_16bit else np.float32
        opt_dtype = ml_dtypes.bfloat16 if cache_16bit else np.float32
        n, cs = self.local_size, self.code_size
        self.code_ = np.zeros((n,) + cs, code_dtype)
        self.m = np.zeros((n,) + cs, opt_dtype)
        self.v = np.zeros((n,) + cs, opt_dtype)
        self.step = np.zeros((n,), np.int32)
        self.density_grid = np.zeros((n, grid_size ** 3), np.float16)
        self.density_bitfield = np.zeros((n, grid_size ** 3 // 8), np.uint8)
        self.seen = np.zeros((n,), bool)

    def _local(self, scene_ids):
        local = np.asarray(scene_ids) - self.offset
        assert (0 <= local).all() and (local < self.local_size).all(), \
            f'scene ids {scene_ids} outside local shard'
        return local

    def load(self, scene_ids, init_code_fn=None):
        """Gather a batch. Unseen scenes get freshly initialized codes via
        ``init_code_fn(num)`` -> (num, *code_size)."""
        li = self._local(scene_ids)
        code_ = self.code_[li].astype(np.float32)
        unseen = ~self.seen[li]
        if unseen.any() and init_code_fn is not None:
            code_[unseen] = np.asarray(init_code_fn(int(unseen.sum())))
        return dict(
            code_=jnp.asarray(code_),
            opt=SceneOptState(
                m=jnp.asarray(self.m[li].astype(np.float32)),
                v=jnp.asarray(self.v[li].astype(np.float32)),
                step=jnp.asarray(self.step[li])),
            density_grid=jnp.asarray(self.density_grid[li]),
            density_bitfield=jnp.asarray(self.density_bitfield[li]))

    def save(self, scene_ids, code_, opt: SceneOptState, density_grid,
             density_bitfield):
        li = self._local(scene_ids)
        self.code_[li] = np.clip(
            np.asarray(code_), np.finfo(self.code_.dtype).min,
            np.finfo(self.code_.dtype).max).astype(self.code_.dtype)
        self.m[li] = np.asarray(opt.m).astype(self.m.dtype)
        self.v[li] = np.asarray(opt.v).astype(self.v.dtype)
        self.step[li] = np.asarray(opt.step)
        self.density_grid[li] = np.asarray(density_grid)
        self.density_bitfield[li] = np.asarray(density_bitfield)
        self.seen[li] = True

    def state_dict(self):
        return {k: getattr(self, k) for k in
                ('code_', 'm', 'v', 'step', 'density_grid',
                 'density_bitfield', 'seen')}

    def load_state_dict(self, d):
        for k, v in d.items():
            getattr(self, k)[...] = v

    def seen_mask(self):
        return self.seen

    def reset(self):
        self.seen[:] = False
        for k in ('code_', 'm', 'v', 'step', 'density_grid',
                  'density_bitfield'):
            getattr(self, k)[...] = 0

    def set_codes(self, code_, zero_opt=True):
        """Overwrite every scene's raw code (code_ may be a single code to
        broadcast)."""
        self.code_[:] = np.asarray(code_).astype(self.code_.dtype)
        if zero_opt:
            self.m[:] = 0
            self.v[:] = 0
            self.step[:] = 0

    def write_scenes(self, local_idx, code_, density_grid, density_bitfield,
                     zero_opt=True):
        li = np.asarray(local_idx)
        self.code_[li] = np.asarray(code_).astype(self.code_.dtype)
        self.density_grid[li] = np.asarray(density_grid)
        self.density_bitfield[li] = np.asarray(density_bitfield)
        if zero_opt:
            self.m[li] = 0
            self.v[li] = 0
            self.step[li] = 0
        self.seen[li] = True


class DeviceSceneCache:
    """HBM-resident scene cache: the whole stacked scene bank (codes, Adam
    moments, density grids/bitfields) lives on device; per-batch access is
    an on-device row gather/scatter instead of a host round-trip (SURVEY.md
    section 7 hard part #2 — the reference ships per-scene state CPU<->GPU
    every iteration, multiscene_nerf.py:71-183).

    Same interface as SceneCache; use for cache sizes that fit HBM
    (cache_16bit recommended for the 2458-scene SRN Cars bank: ~5.8 GB).
    """

    def __init__(self, cache_size, code_size, grid_size, cache_16bit=False,
                 rank=0, world_size=1, mesh=None):
        split = np.round(np.linspace(0, cache_size, world_size + 1)).astype(int)
        self.offset = int(split[rank])
        self.local_size = int(split[rank + 1] - split[rank])
        self.cache_size = cache_size
        self.code_size = tuple(code_size)
        self.grid_size = grid_size
        self._code_dtype = jnp.float16 if cache_16bit else jnp.float32
        self._opt_dtype = jnp.bfloat16 if cache_16bit else jnp.float32
        n, cs = self.local_size, self.code_size
        # Under a device mesh, shard the whole bank over the scene axis so
        # it occupies every chip's HBM evenly (instead of filling chip 0)
        # and batch rows are gathered from their owning chip.
        self._pin = lambda a: a
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            nd = int(np.prod(mesh.devices.shape))
            n = int(np.ceil(n / nd) * nd)  # pad to shardable length
            sharding = NamedSharding(mesh, P(mesh.axis_names[0]))
            self._pin = lambda a: jax.device_put(a, sharding)
        self._bank_size = n
        self.code_ = self._pin(jnp.zeros((n,) + cs, self._code_dtype))
        self.m = self._pin(jnp.zeros((n,) + cs, self._opt_dtype))
        self.v = self._pin(jnp.zeros((n,) + cs, self._opt_dtype))
        self.step = self._pin(jnp.zeros((n,), jnp.int32))
        self.density_grid = self._pin(
            jnp.zeros((n, grid_size ** 3), jnp.float16))
        self.density_bitfield = self._pin(
            jnp.zeros((n, grid_size ** 3 // 8), jnp.uint8))
        self.seen = np.zeros((self.local_size,), bool)  # host-side only

    def _local(self, scene_ids):
        local = np.asarray(scene_ids) - self.offset
        assert (0 <= local).all() and (local < self.local_size).all()
        return local

    # Pure row access, shared by load/save and the runner's fused bank
    # step.  gather/scatter run as ONE jitted dispatch each; the scatter
    # DONATES the bank so XLA updates the multi-GB arrays in place instead
    # of copying them every iteration (an eager `.at[].set()` cannot alias
    # its input: at SRN-Cars scale that was ~5.7 GB of HBM copy per step).
    @staticmethod
    def gather_rows(bank, idx):
        return dict(
            code_=bank['code_'][idx].astype(jnp.float32),
            opt=SceneOptState(
                m=bank['m'][idx].astype(jnp.float32),
                v=bank['v'][idx].astype(jnp.float32),
                step=bank['step'][idx]),
            density_grid=bank['density_grid'][idx],
            density_bitfield=bank['density_bitfield'][idx])

    @staticmethod
    def scatter_rows(bank, idx, scene_batch):
        code_dtype = bank['code_'].dtype
        fin = float(jnp.finfo(code_dtype).max)
        opt = scene_batch['opt']
        return dict(
            code_=bank['code_'].at[idx].set(
                jnp.clip(scene_batch['code_'], -fin, fin).astype(code_dtype)),
            m=bank['m'].at[idx].set(opt.m.astype(bank['m'].dtype)),
            v=bank['v'].at[idx].set(opt.v.astype(bank['v'].dtype)),
            step=bank['step'].at[idx].set(opt.step),
            density_grid=bank['density_grid'].at[idx].set(
                scene_batch['density_grid']),
            density_bitfield=bank['density_bitfield'].at[idx].set(
                scene_batch['density_bitfield']))

    _BANK_KEYS = ('code_', 'm', 'v', 'step', 'density_grid',
                  'density_bitfield')

    def bank(self):
        return {k: getattr(self, k) for k in self._BANK_KEYS}

    def set_bank(self, bank):
        for k in self._BANK_KEYS:
            setattr(self, k, bank[k])

    def ensure_init(self, scene_ids, init_code_fn=None):
        """Write fresh init codes for not-yet-seen scenes (host-side rare
        path, split out so the hot gather/scatter can live inside the
        runner's donated jitted step)."""
        li = self._local(scene_ids)
        unseen = ~self.seen[li]
        if unseen.any() and init_code_fn is not None:
            init = jnp.asarray(
                init_code_fn(int(unseen.sum()))).astype(self._code_dtype)
            self.code_ = self.code_.at[jnp.asarray(li[unseen])].set(init)
            self.seen[li] = True
        return jnp.asarray(li)

    def mark_seen(self, scene_ids):
        self.seen[self._local(scene_ids)] = True

    def load(self, scene_ids, init_code_fn=None):
        idx = self.ensure_init(scene_ids, init_code_fn)
        if not hasattr(self, '_jit_gather'):
            self._jit_gather = jax.jit(self.gather_rows)
        return self._jit_gather(self.bank(), idx)

    def save(self, scene_ids, code_, opt: SceneOptState, density_grid,
             density_bitfield):
        idx = jnp.asarray(self._local(scene_ids))
        if not hasattr(self, '_jit_scatter'):
            self._jit_scatter = jax.jit(self.scatter_rows,
                                        donate_argnums=(0,))
        self.set_bank(self._jit_scatter(
            self.bank(), idx,
            dict(code_=code_, opt=opt, density_grid=density_grid,
                 density_bitfield=density_bitfield)))
        self.seen[self._local(scene_ids)] = True

    def seen_mask(self):
        return self.seen

    def state_dict(self):
        out = {k: np.asarray(getattr(self, k))[:self.local_size] for k in
               ('code_', 'm', 'v', 'step', 'density_grid',
                'density_bitfield')}
        out['seen'] = self.seen
        return out

    def load_state_dict(self, d):
        for k in ('code_', 'm', 'v', 'step', 'density_grid',
                  'density_bitfield'):
            if k in d:
                cur = getattr(self, k)
                val = np.asarray(d[k])
                if val.shape[0] < cur.shape[0]:  # pad to the bank size
                    pad = np.zeros((cur.shape[0] - val.shape[0],)
                                   + val.shape[1:], val.dtype)
                    val = np.concatenate([val, pad], axis=0)
                setattr(self, k, self._pin(jnp.asarray(val).astype(
                    cur.dtype)))
        if 'seen' in d:
            self.seen[...] = d['seen']

    def reset(self):
        self.seen[:] = False
        for k in ('code_', 'm', 'v', 'step', 'density_grid',
                  'density_bitfield'):
            setattr(self, k, self._pin(jnp.zeros_like(getattr(self, k))))

    def set_codes(self, code_, zero_opt=True):
        self.code_ = jnp.broadcast_to(
            jnp.asarray(code_).astype(self._code_dtype),
            self.code_.shape)
        if zero_opt:
            self.m = jnp.zeros_like(self.m)
            self.v = jnp.zeros_like(self.v)
            self.step = jnp.zeros_like(self.step)

    def write_scenes(self, local_idx, code_, density_grid, density_bitfield,
                     zero_opt=True):
        idx = jnp.asarray(np.asarray(local_idx))
        self.code_ = self.code_.at[idx].set(
            jnp.asarray(code_).astype(self._code_dtype))
        self.density_grid = self.density_grid.at[idx].set(
            jnp.asarray(density_grid))
        self.density_bitfield = self.density_bitfield.at[idx].set(
            jnp.asarray(density_bitfield))
        if zero_opt:
            self.m = self.m.at[idx].set(0.0)
            self.v = self.v.at[idx].set(0.0)
            self.step = self.step.at[idx].set(0)
        self.seen[np.asarray(local_idx)] = True


class MultiSceneNeRF:
    """Stage-1 trainer (auto-decoding only).  Holds static config + modules;
    all learnable/running state lives in explicit pytrees."""

    def __init__(self, cfg, train_cfg=None, test_cfg=None):
        cfg = dict(cfg)
        cfg.pop('type', None)
        self.code_size = tuple(cfg.get('code_size', (3, 8, 64, 64)))
        self.code_activation = build_code_activation(
            cfg.get('code_activation', {'type': 'TanhCode', 'scale': 1}))
        self.grid_size = cfg.get('grid_size', 64)
        self.decoder = build_decoder(cfg.get('decoder', {}))
        self.decoder_use_ema = cfg.get('decoder_use_ema', False)
        self.bg_color = cfg.get('bg_color', 1)
        self.pixel_loss = build_pixel_loss(
            cfg.get('pixel_loss', {'type': 'MSELoss'}))
        self.reg_loss = build_reg_loss(cfg.get('reg_loss'))
        self.update_extra_interval = cfg.get('update_extra_interval', 16)
        self.init_from_mean = cfg.get('init_from_mean', False)
        self.init_scale = cfg.get('init_scale', 1e-4)
        self.mean_ema_momentum = cfg.get('mean_ema_momentum', 0.001)
        self.mean_scale = cfg.get('mean_scale', 1.0)
        self.cache_size = cfg.get('cache_size', 0)
        self.cache_16bit = cfg.get('cache_16bit', False)
        self.num_file_writers = cfg.get('num_file_writers', 0)
        self.cache_device = cfg.get('cache_device', 'auto')
        self.train_cfg = dict(train_cfg or {})
        self.test_cfg = dict(test_cfg or {})
        # memory-bounding chunk sizes for the big decode batches (the
        # triplane-sampling intermediate is ~1.5KB per point)
        self.step_chunk = cfg.get('step_chunk', 16)
        self.density_point_chunk = cfg.get('density_point_chunk', 32768)

    # -------------------------------------------------------------- #
    # mutable-config surface (ModelUpdaterHook, test_cfg.override_cfg)
    # -------------------------------------------------------------- #
    def set_dotted(self, key, value):
        """Apply a dotted config path mutation (misc.py:127-156 rsetattr
        semantics for the paths the reference configs actually use)."""
        import dataclasses
        parts = key.split('.')
        root = parts[0]
        if root in ('train_cfg', 'test_cfg'):
            d = getattr(self, root)
            for p in parts[1:-1]:
                d = d.setdefault(p, {})
            d[parts[-1]] = value
        elif root in ('pixel_loss', 'reg_loss'):
            obj = getattr(self, root)
            setattr(self, root,
                    dataclasses.replace(obj, **{parts[-1]: value}))
        elif root == 'decoder' and len(parts) == 2:
            # flax modules are frozen dataclasses: swap in a clone (used by
            # ModelUpdaterHook to schedule march_slots/pack_slots once the
            # density grids have pruned; recompile handled by the runner's
            # step invalidation)
            self.decoder = self.decoder.clone(**{parts[1]: value})
        elif root in ('diffusion', 'diffusion_ema') and len(parts) >= 2 \
                and parts[1] == 'ddpm_loss':
            if parts[2] == 'freeze_norm':
                self.freeze_norm = value
            else:
                new_loss = dataclasses.replace(
                    self.diffusion.ddpm_loss, **{parts[2]: value})
                self.diffusion = dataclasses.replace(
                    self.diffusion, ddpm_loss=new_loss)
        else:
            raise KeyError(f'Unsupported config path: {key}')

    def get_dotted(self, key, default=None):
        import dataclasses  # noqa: F401
        parts = key.split('.')
        root = parts[0]
        if root in ('train_cfg', 'test_cfg'):
            d = getattr(self, root)
            for p in parts[1:]:
                if not isinstance(d, dict) or p not in d:
                    return default
                d = d[p]
            return d
        if root in ('pixel_loss', 'reg_loss'):
            return getattr(getattr(self, root), parts[-1], default)
        if root in ('diffusion', 'diffusion_ema') and len(parts) >= 2 \
                and parts[1] == 'ddpm_loss':
            if parts[2] == 'freeze_norm':
                return getattr(self, 'freeze_norm', default)
            return getattr(self.diffusion.ddpm_loss, parts[2], default)
        return default

    def eval_mode(self):
        """Apply test_cfg.override_cfg swaps (base_nerf.py:131-141)."""
        self._override_backup = {}
        for key, value in self.test_cfg.get('override_cfg', {}).items():
            self._override_backup[key] = self.get_dotted(key)
            self.set_dotted(key, value)

    def train_mode(self):
        for key, value in getattr(self, '_override_backup', {}).items():
            self.set_dotted(key, value)
        self._override_backup = {}

    # -------------------------------------------------------------- #
    # state
    # -------------------------------------------------------------- #
    def make_cache(self, rank=0, world_size=1, mesh=None):
        """cache_device: 'host' | 'device' | 'auto' (default: device when
        the local shard fits the aggregate HBM budget; with a mesh the bank
        is sharded over all its chips)."""
        mode = getattr(self, 'cache_device', 'auto')
        if mode == 'auto':
            split = np.round(np.linspace(0, self.cache_size,
                                         world_size + 1)).astype(int)
            local = int(split[rank + 1] - split[rank])
            code_bytes = 2 if self.cache_16bit else 4
            per_scene = (int(np.prod(self.code_size)) * 3 * code_bytes
                         + self.grid_size ** 3 * 2
                         + self.grid_size ** 3 // 8)
            n_chips = int(np.prod(mesh.devices.shape)) if mesh is not None \
                else 1
            mode = 'device' if local * per_scene < 6e9 * n_chips else 'host'
        if mode == 'device':
            return DeviceSceneCache(self.cache_size, self.code_size,
                                    self.grid_size, self.cache_16bit, rank,
                                    world_size, mesh=mesh)
        return SceneCache(self.cache_size, self.code_size, self.grid_size,
                          self.cache_16bit, rank, world_size)

    def init_state(self, key, optimizer_cfg=None, lr_schedule=None):
        """Initialize decoder params/EMA/optimizer and running buffers."""
        k1, _ = jax.random.split(key)
        dummy_code = jnp.zeros((1,) + self.code_size)
        params = self.decoder.init(
            k1, dummy_code, jnp.zeros((1, 8, 3)), jnp.zeros((1, 8, 3)))
        state = dict(decoder=params)
        if self.decoder_use_ema:
            # materialize a distinct copy so step buffers can be donated
            state['decoder_ema'] = jax.tree_util.tree_map(jnp.copy, params)
        tx = self.make_optimizer(optimizer_cfg, lr_schedule, 'decoder')
        state['opt_decoder'] = tx.init(params)
        state['code_act'] = self.code_activation.init_state()
        state['init_code'] = (jnp.zeros(self.code_size)
                              if self.init_from_mean else None)
        return state

    @staticmethod
    def make_optimizer(optimizer_cfg, lr_schedule, key_name):
        cfg = dict(optimizer_cfg or {'type': 'Adam', 'lr': 1e-3})
        kind = cfg.pop('type', 'Adam')
        assert kind in ('Adam', 'AdamW'), kind
        lr = lr_schedule if lr_schedule is not None else cfg.get('lr', 1e-3)
        wd = cfg.get('weight_decay', 0.0)
        if kind == 'AdamW' or wd:
            return optax.adamw(lr, weight_decay=wd)
        return optax.adam(lr)

    def get_init_code_np(self, num, rng: np.random.RandomState,
                         init_code=None):
        """Fresh raw codes (base_nerf.py:184-192)."""
        if init_code is None:
            return rng.uniform(-self.init_scale, self.init_scale,
                               (num,) + self.code_size).astype(np.float32)
        inv = self.code_activation.inverse(
            jnp.asarray(init_code) * self.mean_scale, None)
        return np.broadcast_to(np.asarray(inv), (num,) + self.code_size).copy()

    def cond_rays(self, data, cfg):
        cond_poses = data['cond_poses']
        cond_intrinsics = data['cond_intrinsics']
        h, w = data['cond_imgs'].shape[2:4]
        rays_o, rays_d = get_cam_rays(cond_poses, cond_intrinsics, h, w)
        dt_gamma_scale = cfg.get('dt_gamma_scale', 0.0)
        dt_gamma = dt_gamma_scale / cond_intrinsics[..., :2].mean(axis=(-2, -1))
        return rays_o, rays_d, dt_gamma

    # -------------------------------------------------------------- #
    # stage-1 train step (multiscene_nerf.py:185-252)
    # -------------------------------------------------------------- #
    def train_step(self, state, scene_batch, data, key, tx):
        """Jit-compatible stage-1 step.

        Args:
            state: model state dict (decoder params / opt / buffers).
            scene_batch: dict from SceneCache.load.
            data: dict of device arrays (cond_imgs/poses/intrinsics).
            tx: optax optimizer for the decoder.

        Returns (state, scene_batch, log_vars).
        """
        tc = self.train_cfg
        cond_imgs = data['cond_imgs']
        rays_o, rays_d, dt_gamma = self.cond_rays(data, tc)
        extra_scene_step = tc.get('extra_scene_step', 0)

        code_ = scene_batch['code_']
        opt = scene_batch['opt']
        grid = scene_batch['density_grid']
        bitfield = scene_batch['density_bitfield']

        key, k_inv, k_upd, k_ray, k_pert = jax.random.split(key, 5)
        if extra_scene_step > 0:
            code_, opt, grid, bitfield, aux = inverse_code(
                self.decoder, state['decoder'], self.code_activation,
                state['code_act'], rays_o, rays_d, cond_imgs, k_inv,
                code_, opt, grid, bitfield,
                grid_size=self.grid_size, pixel_loss=self.pixel_loss,
                reg_loss=self.reg_loss, bg_color=self.bg_color,
                dt_gamma=dt_gamma, n_inverse_steps=extra_scene_step,
                n_inverse_rays=tc.get('n_inverse_rays', 4096),
                loss_coef=tc.get('loss_coef'),
                optimizer_cfg=tc.get('optimizer'),
                density_thresh=tc.get('density_thresh', 0.01),
                update_extra_interval=self.update_extra_interval,
                step_chunk=self.step_chunk,
                density_point_chunk=self.density_point_chunk,
                partial_density_updates=tc.get('density_partial_update', False))

        # joint decoder + code step
        code, new_act_state = self.code_activation(
            code_, state['code_act'], update_stats=True)
        grid, bitfield, _ = update_density_grid(
            self.decoder, state['decoder'], code, grid, k_upd, self.grid_size,
            density_thresh=tc.get('density_thresh', 0.01),
            point_chunk=self.density_point_chunk)

        n_decoder_rays = tc.get('n_decoder_rays', 4096)
        b_rays_o, b_rays_d, target = ray_sample(
            rays_o, rays_d, cond_imgs, n_decoder_rays, key=k_ray)
        num_pixels = int(np.prod(cond_imgs.shape[1:4]))

        def loss_fn(decoder_params, code__):
            code = self.code_activation(code__, new_act_state)
            loss, aux = rendering_loss(
                self.decoder, decoder_params, code, bitfield, target,
                b_rays_o, b_rays_d, self.grid_size, self.pixel_loss,
                self.reg_loss, self.bg_color, dt_gamma, perturb_key=k_pert,
                scale_num_ray=num_pixels, loss_coef=tc.get('loss_coef'),
                step_chunk=self.step_chunk, deterministic=False)
            return loss, aux

        (loss, (out_rgbs, loss_dict)), (g_dec, g_code) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(state['decoder'], code_)
        grad_logs = {}
        if tc.get('log_grad_stats', False):
            from .base import grad_stats_logvars
            grad_logs.update(grad_stats_logvars('decoder', g_dec))
            grad_logs.update(grad_stats_logvars('code', g_code))

        updates, new_opt_dec = tx.update(g_dec, state['opt_decoder'],
                                         state['decoder'])
        new_decoder = optax.apply_updates(state['decoder'], updates)
        opt_cfg = tc.get('optimizer', {})
        code_, opt = adam_step(
            code_, g_code, opt, opt_cfg.get('lr', 1e-2),
            tuple(opt_cfg.get('betas', (0.9, 0.999))),
            weight_decay=opt_cfg.get('weight_decay', 0.0))

        state = dict(state, decoder=new_decoder, opt_decoder=new_opt_dec,
                     code_act=new_act_state)
        code = self.code_activation(code_, new_act_state)
        if state.get('init_code') is not None:
            state['init_code'] = (
                (1 - self.mean_ema_momentum) * state['init_code']
                + self.mean_ema_momentum * code.mean(axis=0))

        log_vars = {k: v for k, v in loss_dict.items()}
        log_vars.update(grad_logs)
        log_vars.update(
            loss=loss,
            train_psnr=psnr(out_rgbs, target),
            code_rms=jnp.sqrt(jnp.mean(code ** 2)))
        scene_batch = dict(code_=code_, opt=opt, density_grid=grid,
                           density_bitfield=bitfield)
        return state, scene_batch, log_vars

    # -------------------------------------------------------------- #
    # evaluation / reconstruction (val_step recon path, base_nerf.py:622-673)
    # -------------------------------------------------------------- #
    def val_inverse_code(self, state, data, key, decoder_params=None):
        """Test-time optimization of codes from cond views."""
        tcfg = self.test_cfg
        cond_imgs = data['cond_imgs']
        rays_o, rays_d, dt_gamma = self.cond_rays(data, tcfg)
        S = cond_imgs.shape[0]
        rng = np.random.RandomState(0)
        code_ = jnp.asarray(self.get_init_code_np(
            S, rng, state.get('init_code')))
        opt = adam_init(code_)
        grid = jnp.zeros((S, self.grid_size ** 3), jnp.float16)
        bitfield = jnp.zeros((S, self.grid_size ** 3 // 8), jnp.uint8)
        if decoder_params is None:
            decoder_params = state.get('decoder_ema', state['decoder']) \
                if self.decoder_use_ema else state['decoder']
        code_, opt, grid, bitfield, aux = inverse_code(
            self.decoder, decoder_params, self.code_activation,
            state['code_act'], rays_o, rays_d, cond_imgs, key,
            code_, opt, grid, bitfield,
            grid_size=self.grid_size, pixel_loss=self.pixel_loss,
            reg_loss=self.reg_loss, bg_color=self.bg_color,
            dt_gamma=dt_gamma,
            n_inverse_steps=tcfg.get('n_inverse_steps', 1000),
            n_inverse_rays=tcfg.get('n_inverse_rays', 4096),
            loss_coef=tcfg.get('loss_coef'),
            optimizer_cfg=tcfg.get('optimizer'),
            lr_scheduler_cfg=tcfg.get('lr_scheduler'),
            density_thresh=tcfg.get('density_thresh', 0.01),
            update_extra_interval=self.update_extra_interval,
            step_chunk=self.step_chunk,
            density_point_chunk=self.density_point_chunk,
            partial_density_updates=tcfg.get('density_partial_update', False))
        code = self.code_activation(code_, state['code_act'])
        return code, grid, bitfield, aux

    def render(self, state, code, density_bitfield, h, w, intrinsics, poses,
               cfg=None, decoder_params=None):
        cfg = cfg if cfg is not None else self.test_cfg
        if decoder_params is None:
            decoder_params = state.get('decoder_ema', state['decoder']) \
                if self.decoder_use_ema else state['decoder']
        # cache one jitted render fn per static signature (avoids eager
        # per-op dispatch for full-image eval renders)
        # test_cfg may override renderer work-reduction knobs for eval
        # renders of pruned scenes (march_slots is exact once each scene's
        # occupied AABB spans <= march_slots steps; pack_slots is the
        # mean_count-style group budget, exact up to budget truncation)
        dec_over = {k: cfg[k] for k in ('march_slots', 'pack_slots')
                    if k in cfg}
        sig = ('render', h, w, cfg.get('dt_gamma_scale', 0.0),
               cfg.get('max_render_rays', -1),
               tuple(sorted(dec_over.items())))
        cache = self.__dict__.setdefault('_jit_cache', {})
        if sig not in cache:
            dt_gamma_scale = cfg.get('dt_gamma_scale', 0.0)
            max_render_rays = cfg.get('max_render_rays', -1)
            decoder = self.decoder.clone(**dec_over) if dec_over \
                else self.decoder

            def fn(decoder_params, code, density_bitfield, intrinsics, poses):
                return render_views(
                    decoder, decoder_params, code, density_bitfield,
                    self.grid_size, poses, intrinsics, h, w,
                    dt_gamma_scale=dt_gamma_scale, bg_color=self.bg_color,
                    max_render_rays=max_render_rays,
                    step_chunk=self.step_chunk)

            cache[sig] = jax.jit(fn)
        return cache[sig](decoder_params, code, density_bitfield,
                          intrinsics, poses)
