"""Noise batching helpers.

Equivalent surface of /root/reference/lib/models/diffusions/utils.py
(``_get_noise_batch_3d``): generate (optionally per-timestep) noise batches
for 2D (B, C, H, W) and 3D (B, C, D, H, W) shapes from an explicit key.
"""
import jax
import jax.numpy as jnp


def get_noise_batch(key, noise_shape, num_batches=0, timesteps_noise=False,
                    num_timesteps=0):
    """Returns noise of shape (num_batches, *noise_shape), or
    (num_timesteps, num_batches, *noise_shape) when timesteps_noise."""
    shape = (num_batches,) + tuple(noise_shape) if num_batches else \
        tuple(noise_shape)
    if timesteps_noise:
        shape = (num_timesteps,) + shape
    return jax.random.normal(key, shape, jnp.float32)


def get_noise_batch_3d(key, noise_shape, num_batches=0, timesteps_noise=False,
                       num_timesteps=0):
    """5D/6D variant for volumetric codes (utils.py in the reference).
    noise_shape: (C, D, H, W)."""
    assert len(noise_shape) == 4
    return get_noise_batch(key, noise_shape, num_batches, timesteps_noise,
                           num_timesteps)
