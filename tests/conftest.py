"""Test configuration: force the CPU backend with 8 virtual devices so
sharding/mesh tests run without TPU hardware (the axon plugin otherwise
claims the default backend via JAX_PLATFORMS=axon)."""

import os

os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = flags + ' --xla_force_host_platform_device_count=8'

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_default_matmul_precision', 'highest')
