"""Test configuration: force an 8-device virtual CPU mesh and float64.

Multi-device sharding (Mesh/shard_map/psum paths) is exercised on CPU using
XLA's host-platform device-count override, so the full multi-chip code path
compiles and runs without TPU hardware.
"""

import os

# Must be set before JAX initializes its backends. Force-override: the
# session environment may preset JAX_PLATFORMS to a TPU plugin, but unit
# tests must run on the virtual 8-device CPU mesh (fast compiles,
# reference-grade f64 transcendentals).
os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8'
    ).strip()

import jax

# The execution environment may force-register a TPU plugin via
# sitecustomize, ignoring JAX_PLATFORMS from the environment — override at
# the config level too.
jax.config.update('jax_platforms', 'cpu')

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
