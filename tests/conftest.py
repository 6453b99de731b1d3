"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding paths can be exercised without TPU hardware."""
import os

os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

# The bundled TPU plugin ignores the JAX_PLATFORMS env var; force via config.
jax.config.update('jax_platforms', 'cpu')
