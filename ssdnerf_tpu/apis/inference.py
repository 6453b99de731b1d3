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
        state, _, _ = load_checkpoint(checkpoint, template=state,
                                      lenient=True)
    if use_fp16:
        model.autocast_dtype = 'bfloat16'
    model.eval_mode()
    return model, state


def interp_noise(endpoints, num_samples, interp_type='linear'):
    """Interpolate between a noise pair along ``num_samples`` stops.

    Args:
        endpoints: (2,) + code_size noise pair.
        interp_type: 'linear' or 'spherical_linear' — the reference's two
            modes (inference.py:75-84); slerp uses the angle between the
            flattened, normalized endpoints so intermediate noises keep
            approximately unit marginal variance.
    Returns:
        (num_samples,) + code_size.
    """
    nd = endpoints.ndim - 1
    alpha = jnp.linspace(0.0, 1.0, num_samples).reshape(
        (-1,) + (1,) * nd)
    a, b = endpoints[0], endpoints[1]
    if interp_type == 'spherical_linear':
        an = a.reshape(-1) / jnp.linalg.norm(a.reshape(-1))
        bn = b.reshape(-1) / jnp.linalg.norm(b.reshape(-1))
        theta = jnp.arccos(jnp.clip(jnp.sum(an * bn), -1.0, 1.0))
        return (jnp.sin((1 - alpha) * theta) * a
                + jnp.sin(alpha * theta) * b) / jnp.sin(theta)
    if interp_type == 'linear':
        return (1 - alpha) * a + alpha * b
    raise AttributeError(interp_type)


def interp_diffusion_nerf_ddim(model, state, num_intermediate=3, batch_size=2,
                               seed=0, key=None, interp_type='linear'):
    """Interpolation between endpoint noises, decoded per-interpolant with
    DDIM (inference.py:57-100; both 'linear' and 'spherical_linear').

    Returns (code, density_grid, density_bitfield) with leading dim
    batch_size * (num_intermediate + 2).
    """
    if key is None:
        key = jax.random.PRNGKey(seed)
    k_noise, k_sample = jax.random.split(key)
    endpoints = jax.random.normal(
        k_noise, (batch_size, 2) + model.code_size)
    noise = jax.vmap(
        lambda e: interp_noise(e, num_intermediate + 2, interp_type)
    )(endpoints)
    noise = noise.reshape((-1,) + model.code_size)
    return model.val_uncond(state, noise, k_sample)
