"""Test configuration: force an 8-device virtual CPU mesh.

Tests run on CPU (the TPU tunnel is reserved for benchmarking) with 8
virtual devices so sharding/collective paths are exercised the same way
the driver's multichip dryrun does.

Note: this container's sitecustomize imports jax and registers the remote
TPU ("axon") PJRT plugin at interpreter start, so environment variables are
too late — we must redirect via jax.config before the backend initializes.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
