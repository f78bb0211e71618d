"""Mesh helpers: replication assertion must catch real desyncs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from vnl_tpu.parallel import mesh as mesh_lib


def _replicated(mesh, value_per_device):
    """Builds an array whose sharding CLAIMS replication but whose
    per-device buffers hold value_per_device[i]."""
    sharding = NamedSharding(mesh, P())
    bufs = [jax.device_put(np.asarray(v, np.float32), d)
            for v, d in zip(value_per_device, mesh.devices.flat)]
    return jax.make_array_from_single_device_arrays(
        bufs[0].shape, sharding, bufs)


def test_assert_is_replicated_passes_on_replicated_tree():
    mesh = mesh_lib.create_mesh(2)
    good = {"a": _replicated(mesh, [[1.0, 2.0]] * 2),
            "b": jnp.ones(3)}  # single-device leaf: trivially fine
    mesh_lib.assert_is_replicated(good)


def test_assert_is_replicated_catches_desync():
    mesh = mesh_lib.create_mesh(2)
    bad = {"w": _replicated(mesh, [[1.0, 2.0], [1.0, 3.0]])}
    with pytest.raises(AssertionError, match="differs between"):
        mesh_lib.assert_is_replicated(bad)


def test_assert_is_replicated_catches_sharded_leaf():
    mesh = mesh_lib.create_mesh(2)
    arr = jax.device_put(np.arange(4, dtype=np.float32),
                         NamedSharding(mesh, P("data")))
    with pytest.raises(AssertionError, match="sharded"):
        mesh_lib.assert_is_replicated({"x": arr})


def test_synchronize_hosts_single_process_noop():
    mesh_lib.synchronize_hosts()  # must not raise
