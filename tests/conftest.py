"""Test configuration: force an 8-device virtual CPU mesh before any jax use.

This is the "fake backend" strategy from SURVEY.md §4: multi-chip sharding
paths are validated on a host-platform device mesh so tests run anywhere.

Note: this environment's sitecustomize registers the 'axon' TPU platform and
overrides the JAX_PLATFORMS env var, so we must force CPU via jax.config
*after* import — otherwise every test compile goes through the TPU tunnel.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(317)
