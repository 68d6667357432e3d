"""Test configuration: force CPU with an 8-device virtual mesh.

Multi-chip sharding is validated on a virtual CPU mesh
(xla_force_host_platform_device_count), as real multi-chip hardware is not
available in CI.

Note: the environment's sitecustomize registers the axon TPU PJRT plugin and
imports jax in every interpreter, so JAX_PLATFORMS must be overridden through
jax.config (env edits are too late) and XLA_FLAGS before first backend use.
"""
import os

# CPU tests don't want the persistent compile cache (risk of loading AOT
# artifacts compiled with mismatched host features); it exists for the TPU
# remote-compile path.
os.environ["STARK_TPU_COMPILE_CACHE"] = ""

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
