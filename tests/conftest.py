"""Test configuration: force an 8-device CPU platform BEFORE jax initializes.

This is the TPU-native analogue of "test multi-node without a cluster"
(SURVEY.md §4): every sharding/mesh test runs against 8 virtual CPU devices.
"""

import os
import sys

# Force-override: the ambient environment may point JAX at the real TPU
# (JAX_PLATFORMS=axon); tests must always run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The environment pre-imports jax targeting the real TPU (sitecustomize in
# /root/.axon_site with JAX_PLATFORMS=axon); the env vars above are then too
# late, so force the platform through the config API as well.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
