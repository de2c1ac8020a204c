"""Test harness: hermetic CPU backend with 8 virtual devices.

The container's sitecustomize force-registers the TPU (axon) PJRT plugin and
overrides ``jax_platforms`` in every interpreter, so setting the env var is
not enough — we must update jax config *after* import, before any backend
initialization.  Multi-chip sharding tests then run on the 8-device virtual
CPU mesh (the standard TPU-free way to exercise pjit/shard_map collectives).
"""

import os

os.environ["JAX_NUM_CPU_DEVICES"] = "8"
os.environ.setdefault("XLA_FLAGS", "")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_mesh():
    assert jax.default_backend() == "cpu"
    assert jax.device_count() == 8
