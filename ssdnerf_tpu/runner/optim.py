"""Optimizer and LR-schedule builders.

Replaces the mmcv lr hooks + multi-optimizer builder
(/root/reference/lib/core/optimizer/builder.py:5-24, lr_config at
configs/paper_cfgs/ssdnerf_cars_uncond.py:115-121) with optax schedules:
one optimizer per top-level submodule ('diffusion', 'decoder').
"""
import optax

# mmcv LrUpdaterHook policies implemented here.  Anything else fails
# LOUDLY at build time instead of silently training at a fixed lr.
SUPPORTED_POLICIES = ('fixed', 'step', 'exp', 'poly', 'cosineannealing')


def build_lr_schedule(base_lr, lr_config, max_iters=None):
    """mmcv-style lr_config -> optax schedule function.

    Supported policies (mmcv LrUpdaterHook semantics):
      - 'Fixed': constant lr.
      - 'step': gamma decays at iteration milestones (``step`` list, or an
        int period).
      - 'exp': lr * gamma**iter.
      - 'poly': lr * (1 - iter/max_iters)**power, floored at min_lr.
      - 'CosineAnnealing': cosine from lr to min_lr (or lr*min_lr_ratio)
        over max_iters.
    All compose with linear warmup (warmup_lr = lr * (1 - (1 -
    i/warmup_iters) * (1 - warmup_ratio))).  Unknown policies raise — a
    config carrying any other mmcv policy must not silently run 'Fixed'.
    """
    lr_config = dict(lr_config or {})
    policy = lr_config.get('policy', 'Fixed')
    if policy.lower() not in SUPPORTED_POLICIES:
        raise ValueError(
            f'unsupported lr policy {policy!r}: supported are '
            f'{SUPPORTED_POLICIES}; add it to '
            'ssdnerf_tpu/runner/optim.py rather than training at fixed lr')
    warmup = lr_config.get('warmup')
    warmup_iters = lr_config.get('warmup_iters', 0)
    warmup_ratio = lr_config.get('warmup_ratio', 0.1)
    gamma = lr_config.get('gamma', 0.1)
    steps = lr_config.get('step', [])
    if isinstance(steps, int):
        step_period = steps
        steps = []
    else:
        step_period = None
        steps = sorted(steps)
    power = lr_config.get('power', 1.0)
    min_lr = lr_config.get('min_lr')
    min_lr_ratio = lr_config.get('min_lr_ratio')
    if policy.lower() in ('poly', 'cosineannealing') and max_iters is None:
        max_iters = lr_config.get('max_iters')
        if max_iters is None:
            raise ValueError(
                f'lr policy {policy!r} needs max_iters (pass it to '
                'build_lr_schedule or set lr_config.max_iters)')

    def schedule(count):
        import jax.numpy as jnp
        lr = jnp.asarray(base_lr, jnp.float32)
        p = policy.lower()
        cnt = jnp.asarray(count, jnp.float32)
        if p == 'step':
            if step_period is not None:
                n_decays = jnp.floor(cnt / step_period)
            else:
                n_decays = jnp.sum(jnp.asarray(
                    [count >= s for s in steps], jnp.float32))
            lr = lr * gamma ** n_decays
        elif p == 'exp':
            lr = lr * gamma ** cnt
        elif p == 'poly':
            floor = 0.0 if min_lr is None else min_lr
            frac = jnp.clip(1.0 - cnt / max_iters, 0.0, 1.0)
            lr = jnp.maximum(lr * frac ** power, floor)
        elif p == 'cosineannealing':
            import numpy as np
            target = (base_lr * min_lr_ratio if min_lr_ratio is not None
                      else (min_lr if min_lr is not None else 0.0))
            frac = jnp.clip(cnt / max_iters, 0.0, 1.0)
            lr = target + 0.5 * (lr - target) * (1.0 + jnp.cos(np.pi * frac))
        if warmup == 'linear' and warmup_iters > 0:
            frac = jnp.minimum(cnt / warmup_iters, 1.0)
            factor = 1.0 - (1.0 - frac) * (1.0 - warmup_ratio)
            lr = lr * factor
        return lr

    return schedule


def build_optimizers(model, optimizer_cfg, lr_config=None, max_iters=None):
    """dict-of-dicts -> {name: optax optimizer} with shared lr schedule."""
    txs = {}
    schedules = {}
    for name, cfg in (optimizer_cfg or {}).items():
        cfg = dict(cfg)
        base_lr = cfg.get('lr', 1e-3)
        sched = build_lr_schedule(base_lr, lr_config, max_iters=max_iters)
        schedules[name] = sched
        txs[name] = model.make_optimizer(cfg, sched, name)
    return txs, schedules
