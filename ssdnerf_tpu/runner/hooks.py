"""Training hooks.

Equivalents of /root/reference/lib/runner/hooks/ plus the external mmcv/mmgen
hooks the reference relies on (EMA, checkpoint, loggers):

- EMAHook: mmgen ExponentialMovingAverageHook with StyleGAN rampup momentum
  (configs/paper_cfgs/ssdnerf_cars_uncond.py:152-161).
- SaveCacheHook / ResetCacheHook / MeanCacheHook: cache.py:14-228.
- ModelUpdaterHook: scheduled dotted-config surgery (model_updater.py:24-39);
  invalidates the runner's compiled step so the new statics take effect.
- SaveStatsHook (save_stats.py), DirCopyHook (filesystem.py),
  TextLoggerHook, CheckpointHook.
"""
import os
import json
import shutil
import time

import numpy as np
import jax
import jax.numpy as jnp


class Hook:
    priority = 50  # lower = earlier

    def before_run(self, runner):
        pass

    def after_train_iter(self, runner):
        pass

    def after_run(self, runner):
        pass

    def every_n_iters(self, runner, n):
        # runner.iteration counts *completed* iterations (1-based)
        return n > 0 and runner.iteration % n == 0


class EMAHook(Hook):
    priority = 10  # VERY_HIGH

    def __init__(self, module_keys=('diffusion_ema', 'decoder_ema'),
                 interp_mode='lerp', interval=1, start_iter=0,
                 momentum_policy='rampup', momentum_cfg=None, **kwargs):
        self.module_keys = tuple(module_keys)
        self.interval = interval
        self.start_iter = start_iter
        self.momentum_policy = momentum_policy
        self.momentum_cfg = dict(momentum_cfg or {})
        # the EMA tree is donated: the lerp updates the ~0.5 GB UNet EMA
        # in place instead of allocating a fresh tree every iteration
        # (safe because the start_iter snapshot below is a real copy, so
        # ema never aliases the live params)
        self._lerp = jax.jit(
            lambda ema, p, beta: jax.tree_util.tree_map(
                lambda e, q: beta * e + (1 - beta) * q, ema, p),
            donate_argnums=(0,))
        self._copy = jax.jit(
            lambda p: jax.tree_util.tree_map(jnp.copy, p))

    def momentum(self, runner):
        if self.momentum_policy == 'rampup':
            cfg = self.momentum_cfg
            batch_size = cfg.get('batch_size', 4)
            ema_kimg = cfg.get('ema_kimg', 10)
            ema_rampup = cfg.get('ema_rampup', None)
            eps = cfg.get('eps', 1e-8)
            cur_nimg = runner.iteration * batch_size
            ema_nimg = ema_kimg * 1000
            if ema_rampup is not None:
                ema_nimg = min(ema_nimg, cur_nimg * ema_rampup)
            return 0.5 ** (batch_size / max(ema_nimg, eps))
        return self.momentum_cfg.get('momentum', 0.999)

    def after_train_iter(self, runner):
        if runner.iteration % self.interval != 0:
            return
        state = runner.state
        for ema_key in self.module_keys:
            src_key = ema_key[:-len('_ema')]
            if ema_key not in state or src_key not in state:
                continue
            if runner.iteration - 1 < self.start_iter:
                state[ema_key] = self._copy(state[src_key])
            else:
                state[ema_key] = self._lerp(
                    state[ema_key], state[src_key],
                    float(self.momentum(runner)))


class SaveCacheHook(Hook):
    """Periodically persist every cached scene state to ``out_dir``
    (cache.py:14-68).  Files are .npz with the reference's key names."""
    priority = 50

    def __init__(self, interval=5000, out_dir=None, viz_dir=None,
                 viz_step=32, **kwargs):
        self.interval = interval
        self.out_dir = out_dir
        self.viz_dir = viz_dir
        self.viz_step = viz_step

    def after_train_iter(self, runner):
        if not self.every_n_iters(runner, self.interval):
            return
        self.save_all(runner)

    def after_run(self, runner):
        self.save_all(runner)

    def save_all(self, runner):
        cache = runner.cache
        if cache is None or self.out_dir is None:
            return
        os.makedirs(self.out_dir, exist_ok=True)
        names = runner.scene_names
        sd = cache.state_dict()  # host copies (works for the HBM cache too)
        for li in range(cache.local_size):
            if not sd['seen'][li]:
                continue
            gid = cache.offset + li
            name = names[gid] if names is not None else f'{gid:06d}'
            np.savez(
                os.path.join(self.out_dir, name + '.npz'),
                scene_id=gid, scene_name=name,
                code_=sd['code_'][li],
                density_grid=sd['density_grid'][li],
                density_bitfield=sd['density_bitfield'][li],
                optimizer_m=np.asarray(sd['m'][li], np.float32),
                optimizer_v=np.asarray(sd['v'][li], np.float32),
                optimizer_step=sd['step'][li])
        if self.viz_dir is not None:
            # triplane visualizations for every viz_step-th cached scene
            # (cache.py viz_step semantics)
            from ..apis.eval_utils import visualize_triplane
            model = runner.model
            sel = [li for li in range(0, cache.local_size,
                                      max(self.viz_step, 1))
                   if sd['seen'][li]]
            if sel:
                codes = jnp.asarray(
                    sd['code_'][sel].astype(np.float32))
                codes = model.code_activation(
                    codes, runner.state.get('code_act'))
                sel_names = [
                    names[cache.offset + li] if names is not None
                    else f'{cache.offset + li:06d}' for li in sel]
                visualize_triplane(codes, sel_names, self.viz_dir)


class ResetCacheHook(Hook):
    """Null the cache on interval (cache.py:71-102)."""

    def __init__(self, interval=0, **kwargs):
        self.interval = interval

    def after_train_iter(self, runner):
        if self.every_n_iters(runner, self.interval):
            runner.cache.reset()


class UpdateCacheHook(Hook):
    """Mid-training full-dataset cache rebuild: re-optimize every cached
    scene's code with test-time settings (cache.py:105-170)."""

    def __init__(self, interval=0, step=(), batch_size=8, **kwargs):
        self.interval = interval
        self.steps = set(step)
        self.batch_size = batch_size

    def after_train_iter(self, runner):
        if not (self.every_n_iters(runner, self.interval)
                or runner.iteration in self.steps):
            return
        cache = runner.cache
        model = runner.model
        dataset = runner.data_loader.dataset
        runner.log_text('UpdateCacheHook: rebuilding cache with test-time '
                        'optimization...')
        import jax
        import jax.numpy as jnp
        model.eval_mode()
        try:
            for start in range(0, cache.local_size, self.batch_size):
                gids = [cache.offset + li for li in
                        range(start, min(start + self.batch_size,
                                         cache.local_size))]
                samples = [dataset[g] for g in gids]
                from ..data.builder import collate
                batch = collate(samples)
                data = {k: jnp.asarray(v) for k, v in batch.items()
                        if isinstance(v, np.ndarray)}
                key = jax.random.fold_in(runner.base_key,
                                         10_000_000 + start)
                code, grid, bitfield, _ = model.val_inverse_code(
                    runner.state, data, key)
                code_ = model.code_activation.inverse(
                    code, runner.state.get('code_act'))
                li = np.asarray(gids) - cache.offset
                cache.write_scenes(li, code_, grid, bitfield, zero_opt=True)
        finally:
            model.train_mode()
        runner.invalidate_step()
        runner.log_text('UpdateCacheHook: done.')


class MeanCacheHook(Hook):
    """Replace every cached code with the dataset mean code — the 'triplane
    reset' (cache.py:173-228, ssdnerf_cars3v_uncond_2m.py:165-168).
    ``load_from`` optionally preloads the cache from a code dir first."""

    def __init__(self, step=(), load_from=None, **kwargs):
        self.steps = set(step)
        self.load_from = load_from

    def before_run(self, runner):
        if 0 in self.steps:
            self._apply(runner)

    def after_train_iter(self, runner):
        if runner.iteration in self.steps:
            self._apply(runner)

    def _apply(self, runner):
        if self.load_from is not None:
            from ..apis.train import load_cache_from_dir
            load_cache_from_dir(runner.cache, self.load_from,
                                runner.scene_names)
        cache = runner.cache
        model = runner.model
        init_code = runner.state.get('init_code')
        if init_code is None:
            sd = cache.state_dict()
            seen = sd['seen']
            mean_code = sd['code_'][seen].astype(np.float32).mean(0) \
                if seen.any() else np.zeros(cache.code_size, np.float32)
            code_ = np.asarray(model.code_activation.inverse(
                jnp.asarray(mean_code)[None], runner.state.get('code_act')))[0]
        else:
            code_ = np.asarray(model.code_activation.inverse(
                jnp.asarray(init_code)[None] * model.mean_scale,
                runner.state.get('code_act')))[0]
        cache.set_codes(code_[None], zero_opt=True)


class ModelUpdaterHook(Hook):
    """Scheduled config surgery (model_updater.py:24-39)."""
    priority = 40

    def __init__(self, step=(), cfgs=(), **kwargs):
        self.steps = list(step)
        self.cfgs = list(cfgs)

    def after_train_iter(self, runner):
        it = runner.iteration
        for s, cfg in zip(self.steps, self.cfgs):
            if it == s:
                for key, value in cfg.items():
                    runner.model.set_dotted(key, value)
                runner.invalidate_step()
                runner.log_text(f'ModelUpdaterHook applied at iter {it}: {cfg}')


class SaveStatsHook(Hook):
    """Per-iteration scalar stats dump (save_stats.py analog): writes the
    latest log_vars + param RMS to a jsonl file per rank."""

    def __init__(self, interval=50, **kwargs):
        self.interval = interval

    def after_train_iter(self, runner):
        if not self.every_n_iters(runner, self.interval):
            return
        path = os.path.join(runner.work_dir,
                            f'stats_rank{runner.rank}.jsonl')
        stats = {k: float(v) for k, v in runner.last_log_vars.items()
                 if np.isscalar(v) or getattr(v, 'ndim', 1) == 0}
        stats['iter'] = runner.iteration
        with open(path, 'a') as f:
            f.write(json.dumps(stats) + '\n')


class DirCopyHook(Hook):
    """Periodic backup copy of the cache dir (filesystem.py)."""

    def __init__(self, interval=0, in_dir=None, out_dir=None, **kwargs):
        self.interval = interval
        self.in_dir = in_dir
        self.out_dir = out_dir

    def after_train_iter(self, runner):
        if self.every_n_iters(runner, self.interval) and self.in_dir and \
                os.path.isdir(self.in_dir):
            shutil.copytree(self.in_dir, self.out_dir, dirs_exist_ok=True)


class TextLoggerHook(Hook):
    priority = 90

    def __init__(self, interval=50, **kwargs):
        self.interval = interval
        self._t0 = None
        self._it0 = 0

    def before_run(self, runner):
        self._t0 = time.time()
        self._it0 = runner.iteration

    def after_train_iter(self, runner):
        if not self.every_n_iters(runner, self.interval):
            return
        now = time.time()
        it = runner.iteration
        ips = (it - self._it0) / max(now - self._t0, 1e-9)
        self._t0, self._it0 = now, it
        vals = ', '.join(
            f'{k}: {float(v):.4g}' for k, v in runner.last_log_vars.items()
            if np.isscalar(v) or getattr(v, 'ndim', 1) == 0)
        runner.log_text(
            f'Iter [{it}/{runner.max_iters}] {ips:.2f} it/s  {vals}')


class TensorboardLoggerHook(Hook):
    priority = 90

    def __init__(self, interval=50, **kwargs):
        self.interval = interval
        self.writer = None

    def before_run(self, runner):
        try:
            from tensorboardX import SummaryWriter
            self.writer = SummaryWriter(
                os.path.join(runner.work_dir, 'tf_logs'))
        except Exception:
            self.writer = None

    def after_train_iter(self, runner):
        if self.writer is None or not self.every_n_iters(runner, self.interval):
            return
        for k, v in runner.last_log_vars.items():
            try:
                self.writer.add_scalar(k, float(v), runner.iteration)
            except (TypeError, ValueError):
                pass


class CheckpointHook(Hook):
    priority = 70

    def __init__(self, interval=5000, max_keep_ckpts=-1, **kwargs):
        self.interval = interval
        self.max_keep = max_keep_ckpts

    def after_train_iter(self, runner):
        if self.every_n_iters(runner, self.interval):
            runner.save_checkpoint()
            if self.max_keep > 0:
                runner.prune_checkpoints(self.max_keep)

    def after_run(self, runner):
        runner.save_checkpoint()


class ProfilerHook(Hook):
    """jax.profiler trace capture over a window of iterations (SURVEY.md
    section 5: the reference has no tracing; this is the TPU-native
    equivalent — view with TensorBoard or xprof)."""

    def __init__(self, start_iter=10, num_iters=5, out_dir=None, **kwargs):
        self.start_iter = start_iter
        self.num_iters = num_iters
        self.out_dir = out_dir
        self._active = False

    def after_train_iter(self, runner):
        if runner.iteration == self.start_iter and not self._active:
            out = self.out_dir or os.path.join(runner.work_dir, 'profile')
            jax.profiler.start_trace(out)
            self._active = True
            runner.log_text(f'ProfilerHook: tracing to {out}')
        elif self._active and runner.iteration >= \
                self.start_iter + self.num_iters:
            jax.profiler.stop_trace()
            self._active = False
            runner.log_text('ProfilerHook: trace complete')


_HOOKS = {
    'ExponentialMovingAverageHook': EMAHook,
    'ProfilerHook': ProfilerHook,
    'SaveCacheHook': SaveCacheHook,
    'ResetCacheHook': ResetCacheHook,
    'UpdateCacheHook': UpdateCacheHook,
    'MeanCacheHook': MeanCacheHook,
    'ModelUpdaterHook': ModelUpdaterHook,
    'SaveStatsHook': SaveStatsHook,
    'DirCopyHook': DirCopyHook,
    'TextLoggerHook': TextLoggerHook,
    'TensorboardLoggerHook': TensorboardLoggerHook,
    'CheckpointHook': CheckpointHook,
}

_PRIORITY = {'VERY_HIGH': 10, 'HIGH': 30, 'NORMAL': 50, 'LOW': 70,
             'VERY_LOW': 90}


def build_hooks(hook_cfgs):
    hooks = []
    for cfg in hook_cfgs or []:
        cfg = dict(cfg)
        kind = cfg.pop('type')
        prio = cfg.pop('priority', None)
        cfg.pop('by_epoch', None)
        if kind not in _HOOKS:
            continue
        hook = _HOOKS[kind](**cfg)
        if prio is not None:
            hook.priority = _PRIORITY.get(prio, prio)
        hooks.append(hook)
    return sorted(hooks, key=lambda h: h.priority)
