"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding logic is exercised on a CPU mesh
(xla_force_host_platform_device_count), the TPU-native analogue of the
reference's faked-env distributed tests
(test/espnet2/train/test_distributed_utils.py) — but here the sharded train
step actually compiles and runs.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize imports jax at interpreter startup with
# JAX_PLATFORMS=axon already captured; override the live config too.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


REFERENCE_DIR = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(REFERENCE_DIR)


requires_reference = pytest.mark.skipif(
    not has_reference(), reason="reference repo not mounted"
)
