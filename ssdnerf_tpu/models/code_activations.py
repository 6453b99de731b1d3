"""Latent-code activations (squashing functions).

Functional equivalents of TanhCode / IdentityCode / NormalizedTanhCode
(/root/reference/lib/models/autodecoders/base_nerf.py:26-76).  The
NormalizedTanhCode running statistics are explicit state threaded through
the train step (a (mean, var) pair) instead of module buffers; the cross-rank
``reduce_mean`` becomes a ``jax.lax.pmean`` when running under shard_map, or
is applied by the caller after the step.
"""
from dataclasses import dataclass
from typing import Optional, Tuple

import jax.numpy as jnp


@dataclass(frozen=True)
class TanhCode:
    scale: float = 1.0
    eps: float = 1e-5

    def init_state(self):
        return None

    def __call__(self, code_, state=None, update_stats=False):
        code = jnp.tanh(code_)
        if self.scale != 1:
            code = code * self.scale
        return (code, state) if update_stats else code

    def inverse(self, code, state=None):
        c = code / self.scale if self.scale != 1 else code
        return jnp.arctanh(jnp.clip(c, -1 + self.eps, 1 - self.eps))


@dataclass(frozen=True)
class IdentityCode:
    def init_state(self):
        return None

    def __call__(self, code_, state=None, update_stats=False):
        return (code_, state) if update_stats else code_

    def inverse(self, code, state=None):
        return code


@dataclass(frozen=True)
class NormalizedTanhCode:
    mean: float = 0.0
    std: float = 1.0
    clip_range: float = 1.0
    eps: float = 1e-5
    momentum: float = 0.001

    def init_state(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return (jnp.zeros((1,), jnp.float32),
                jnp.full((1,), self.std ** 2, jnp.float32))

    def __call__(self, code_, state, update_stats=False):
        running_mean, running_var = state
        if update_stats:
            mean = jnp.mean(code_)
            var = jnp.var(code_, ddof=1)
            running_mean = running_mean * (1 - self.momentum) + self.momentum * mean
            running_var = running_var * (1 - self.momentum) + self.momentum * var
            state = (running_mean, running_var)
        scale = self.std / (jnp.sqrt(running_var) + self.eps)
        out = jnp.tanh(
            (code_ * scale + (self.mean - running_mean * scale)) / self.clip_range
        ) * self.clip_range
        return (out, state) if update_stats else out

    def inverse(self, code, state):
        running_mean, running_var = state
        scale = (jnp.sqrt(running_var) + self.eps) / self.std
        return jnp.arctanh(
            jnp.clip(code / self.clip_range, -1 + self.eps, 1 - self.eps)
        ) * (self.clip_range * scale) + (running_mean - self.mean * scale)


_ACTIVATIONS = {
    'TanhCode': TanhCode,
    'IdentityCode': IdentityCode,
    'NormalizedTanhCode': NormalizedTanhCode,
}


def build_code_activation(cfg: Optional[dict]):
    cfg = dict(cfg or {'type': 'IdentityCode'})
    return _ACTIVATIONS[cfg.pop('type')](**cfg)
