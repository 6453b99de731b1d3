"""Loss modules (functional).

Equivalents of /root/reference/lib/models/losses/: DDPMMSELossMod with
timestep-weight rescale, quartile logging and running scale-norm
(ddpm_loss.py:11-128), the mmgen MSELoss pixel loss, RegLoss (reg_loss.py),
TVLoss (tv_loss.py) and L1LossMod (l1_loss.py).  Running statistics
(``norm_factor``) are explicit state returned from the call instead of
buffers.
"""
from dataclasses import dataclass
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class MSELoss:
    loss_weight: float = 1.0

    def __call__(self, pred, target):
        return jnp.mean((pred - target) ** 2) * self.loss_weight


@dataclass(frozen=True)
class L1Loss:
    loss_weight: float = 1.0

    def __call__(self, pred, target=None):
        if target is None or (isinstance(target, int) and target == 0):
            loss = jnp.abs(pred)
        elif isinstance(target, int) and target == -1:
            loss = pred
        else:
            loss = jnp.abs(pred - target)
        return jnp.mean(loss) * self.loss_weight


@dataclass(frozen=True)
class RegLoss:
    power: int = 1
    loss_weight: float = 1.0

    def __call__(self, tensor):
        a = jnp.abs(tensor)
        if self.power != 1:
            a = a ** self.power
        return jnp.mean(a) * self.loss_weight


@dataclass(frozen=True)
class TVLoss:
    dims: tuple = (-2, -1)
    power: int = 1
    loss_weight: float = 1.0

    def __call__(self, tensor):
        diffs = []
        for dim in self.dims:
            d = jnp.diff(tensor, axis=dim)
            pad = [(0, 0)] * tensor.ndim
            pad[dim] = (0, 1)
            diffs.append(jnp.pad(d, pad))
        # safe norm: jnp.linalg.norm has a NaN gradient at exactly 0 (torch
        # subgradients it to 0, and init_from_mean starts codes at 0)
        sq = sum(d * d for d in diffs)
        norm = jnp.sqrt(jnp.maximum(sq, 1e-24))
        return jnp.mean(norm ** self.power) * self.loss_weight


@dataclass(frozen=True)
class DDPMMSELoss:
    """v/eps/x0 MSE with per-timestep weights and running scale-norm.

    The per-sample loss is ``0.5 * mean_{CHW}((pred - target)^2)`` scaled by
    ``sampler.weight[t] * weight_scale`` then batch-averaged and divided by
    the running ``norm_factor`` (EMA of E[x_0^2], cross-rank mean applied by
    the caller under pmean).  State = norm_factor (1,) float32.
    """
    weight: Optional[np.ndarray] = None     # (T,) timestep weights
    weight_scale: float = 1.0
    rescale_mode: Optional[str] = None      # None | 'timestep_weight'
    scale_norm: bool = False
    momentum: float = 0.001
    log_quartiles: bool = True
    num_timesteps: int = 1000

    def init_state(self):
        if self.scale_norm:
            return jnp.ones((1,), jnp.float32)
        return None

    def __call__(self, pred, target, timesteps, x_0, state=None,
                 update_norm=False):
        """Returns (loss, new_state, log_vars)."""
        per_sample = 0.5 * jnp.mean(
            (pred - target) ** 2, axis=tuple(range(1, pred.ndim)))
        if self.rescale_mode == 'timestep_weight':
            w = jnp.asarray(self.weight, jnp.float32)[timesteps]
            per_sample = per_sample * w * self.weight_scale
        loss = jnp.mean(per_sample)

        log_vars = {}
        if self.log_quartiles:
            quartile = (timesteps.astype(jnp.float32)
                        / self.num_timesteps * 4).astype(jnp.int32)
            for q in range(4):
                mask = quartile == q
                denom = jnp.maximum(mask.sum(), 1)
                log_vars[f'loss_mse_quartile_{q}'] = jnp.where(
                    mask.any(), (per_sample * mask).sum() / denom, jnp.nan)

        new_state = state
        if self.scale_norm:
            if update_norm:
                norm = jnp.mean(jnp.square(jax.lax.stop_gradient(x_0)))
                new_state = (1 - self.momentum) * state + self.momentum * norm
            # the reference updates the EMA buffer BEFORE dividing
            # (ddpm_loss.py:91-113: norm_factor[:] = ... then loss /= it),
            # so the divisor is the UPDATED factor — caught by the
            # round-4 torch train-step parity harness
            loss = loss / jax.lax.stop_gradient(new_state[0])
        log_vars['loss_ddpm_mse'] = loss
        return loss, new_state, log_vars


_PIXEL_LOSSES = {'MSELoss': MSELoss, 'L1LossMod': L1Loss, 'L1Loss': L1Loss}
_REG_LOSSES = {'RegLoss': RegLoss, 'TVLoss': TVLoss}


def build_pixel_loss(cfg):
    cfg = dict(cfg)
    return _PIXEL_LOSSES[cfg.pop('type')](**cfg)


def build_reg_loss(cfg):
    if cfg is None:
        return None
    cfg = dict(cfg)
    kind = cfg.pop('type')
    if kind == 'TVLoss' and 'dims' in cfg:
        cfg['dims'] = tuple(cfg['dims'])
    return _REG_LOSSES[kind](**cfg)


def build_ddpm_loss(cfg, sampler, num_timesteps):
    cfg = dict(cfg)
    kind = cfg.pop('type')
    assert kind in ('DDPMMSELossMod', 'DDPMMSELoss'), kind
    log_cfgs = cfg.pop('log_cfgs', None)
    cfg.pop('data_info', None)  # pred/target keys are fixed by mean mode
    return DDPMMSELoss(
        weight=sampler.weight,
        weight_scale=cfg.get('weight_scale', 1.0),
        rescale_mode=cfg.get('rescale_mode', None),
        scale_norm=cfg.get('scale_norm', False),
        momentum=cfg.get('momentum', 0.001),
        log_quartiles=bool(log_cfgs),
        num_timesteps=num_timesteps)
