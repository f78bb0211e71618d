"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding (shard_map/pjit over a Mesh) is exercised on virtual CPU
devices; real-TPU benchmarking happens in bench.py, not in the test suite.

Note: the environment's sitecustomize imports jax at interpreter startup, so
JAX_PLATFORMS in os.environ is too late here — we switch platforms through
jax.config before any backend is initialized instead.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

if os.environ.get("VNL_TPU_TEST_BACKEND", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
