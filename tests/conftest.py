"""Test configuration: force an 8-device virtual CPU mesh.

This is the TPU-world analogue of the reference's gloo/CPU fallback: all
sharding and collective logic runs against virtual devices so the full
multi-chip path is exercised without TPU hardware.

Note: the environment pins ``JAX_PLATFORMS=axon`` (real TPU tunnel); tests
explicitly override it unless PCCF_TEST_TPU=1 is set to run kernel tests on
the real chip.
"""

import os

_USE_TPU = os.environ.get('PCCF_TEST_TPU', '0') == '1'

if not _USE_TPU:
    os.environ['JAX_PLATFORMS'] = 'cpu'
    flags = os.environ.get('XLA_FLAGS', '')
    if '--xla_force_host_platform_device_count' not in flags:
        os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

if not _USE_TPU:
    jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', False)
