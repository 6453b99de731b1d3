"""Inference API.

Equivalent of /root/reference/lib/apis/inference.py: ``init_model`` loads a
config + checkpoint for evaluation (EMA modules preferred, optional bf16),
``interp_diffusion_nerf_ddim`` interpolates in noise space and decodes each
interpolant with DDIM.
"""
import jax
import jax.numpy as jnp

from ..config import Config
from ..registry import build_model
from ..core.checkpoint import load_checkpoint


def init_model(config, checkpoint=None, use_fp16=False):
    """Returns (model, state)."""
    if isinstance(config, str):
        config = Config.fromfile(config)
    model = build_model(config.model, train_cfg=config.get('train_cfg'),
                        test_cfg=config.get('test_cfg'))
    state = model.init_state(jax.random.PRNGKey(0),
                             config.get('optimizer', {}))
    if checkpoint is not None:
        state, _, _ = load_checkpoint(checkpoint, template=state)
    if use_fp16:
        model.autocast_dtype = 'bfloat16'
    model.eval_mode()
    return model, state


def interp_diffusion_nerf_ddim(model, state, num_intermediate=3, batch_size=2,
                               seed=0, key=None):
    """Spherical-free linear interpolation between endpoint noises, decoded
    per-interpolant (inference.py:57-100).

    Returns (code, density_grid, density_bitfield) with leading dim
    batch_size * (num_intermediate + 2).
    """
    if key is None:
        key = jax.random.PRNGKey(seed)
    k_noise, k_sample = jax.random.split(key)
    endpoints = jax.random.normal(
        k_noise, (batch_size, 2) + model.code_size)
    w = jnp.linspace(0, 1, num_intermediate + 2)
    noise = (endpoints[:, :1] * (1 - w).reshape(1, -1, *([1] * len(model.code_size)))
             + endpoints[:, 1:] * w.reshape(1, -1, *([1] * len(model.code_size))))
    noise = noise.reshape((-1,) + model.code_size)
    return model.val_uncond(state, noise, k_sample)
