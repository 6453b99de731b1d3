"""Activation ops.

``trunc_exp`` mirrors the reference's CUDA TruncExp
(/root/reference/lib/ops/activation.py:8-44): forward is ``exp(x)``, backward
multiplies the cotangent by ``exp(clamp(x))`` so gradients never explode for
large sigma pre-activations.
"""
import jax
import jax.numpy as jnp

_CLAMP = 15.0  # exp(15) ~ 3.3e6, matches the reference's backward clamp range


@jax.custom_vjp
def trunc_exp(x):
    return jnp.exp(x)


def _trunc_exp_fwd(x):
    return jnp.exp(x), x


def _trunc_exp_bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, -_CLAMP, _CLAMP)),)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)
