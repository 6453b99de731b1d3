"""Optimizer and LR-schedule builders.

Replaces the mmcv lr hooks + multi-optimizer builder
(/root/reference/lib/core/optimizer/builder.py:5-24, lr_config at
configs/paper_cfgs/ssdnerf_cars_uncond.py:115-121) with optax schedules:
one optimizer per top-level submodule ('diffusion', 'decoder').
"""
import optax


def build_lr_schedule(base_lr, lr_config):
    """mmcv-style lr_config -> optax schedule function.

    Supports policy 'step' (gamma decays at iteration milestones) and
    'Fixed', with linear warmup (warmup_lr = lr * (1 - (1 - i/warmup_iters)
    * (1 - warmup_ratio)), mmcv LrUpdaterHook semantics).
    """
    lr_config = dict(lr_config or {})
    policy = lr_config.get('policy', 'Fixed')
    warmup = lr_config.get('warmup')
    warmup_iters = lr_config.get('warmup_iters', 0)
    warmup_ratio = lr_config.get('warmup_ratio', 0.1)
    gamma = lr_config.get('gamma', 0.1)
    steps = sorted(lr_config.get('step', []))

    def schedule(count):
        import jax.numpy as jnp
        lr = jnp.asarray(base_lr, jnp.float32)
        if policy.lower() == 'step' and steps:
            n_decays = jnp.sum(jnp.asarray(
                [count >= s for s in steps], jnp.float32))
            lr = lr * gamma ** n_decays
        if warmup == 'linear' and warmup_iters > 0:
            frac = jnp.minimum(
                jnp.asarray(count, jnp.float32) / warmup_iters, 1.0)
            factor = 1.0 - (1.0 - frac) * (1.0 - warmup_ratio)
            lr = lr * factor
        return lr

    return schedule


def build_optimizers(model, optimizer_cfg, lr_config=None):
    """dict-of-dicts -> {name: optax optimizer} with shared lr schedule."""
    txs = {}
    schedules = {}
    for name, cfg in (optimizer_cfg or {}).items():
        cfg = dict(cfg)
        base_lr = cfg.get('lr', 1e-3)
        sched = build_lr_schedule(base_lr, lr_config)
        schedules[name] = sched
        txs[name] = model.make_optimizer(cfg, sched, name)
    return txs, schedules
