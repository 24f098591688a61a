"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated on a virtual CPU mesh (the real environment
has a single TPU chip); setting the flags before jax import is mandatory.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin force-selects its platform via jax.config at import
# time (sitecustomize); override it back to CPU for the virtual-mesh tests.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_SCORES_DIR = "/root/reference/scores"


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(688)
