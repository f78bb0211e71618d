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
    """Checks every pytree leaf holds identical values on all local devices
    (brax.training.pmap.assert_is_replicated equivalent).

    A leaf passes iff (a) its sharding claims full replication AND (b) the
    actual per-device buffers are bit-identical — (b) catches desyncs that a
    shard_map with an unchecked replicated out_spec could smuggle through.
    Raises AssertionError on the first offending leaf.
    """
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(x)[0]
    for path, y in leaves_with_paths:
        if not isinstance(y, jax.Array):
            continue
        shards = getattr(y, "addressable_shards", None)
        if shards is None or len(shards) <= 1:
            continue
        if not y.sharding.is_fully_replicated:
            raise AssertionError(
                f"leaf {jax.tree_util.keystr(path)} is sharded "
                f"({y.sharding}), expected replicated"
                + (f"; {debug}" if debug else ""))
        ref_val = np.asarray(shards[0].data)
        for s in shards[1:]:
            val = np.asarray(s.data)
            if not np.array_equal(val, ref_val, equal_nan=True):
                raise AssertionError(
                    f"leaf {jax.tree_util.keystr(path)} differs between "
                    f"device {shards[0].device} and {s.device}"
                    + (f"; {debug}" if debug else ""))


def synchronize_hosts():
    """Barrier across processes (brax.training.pmap.synchronize_hosts):
    a psum of ones over the full device mesh — every process must enter the
    program before any can leave. Expressed with Mesh + shard_map (not pmap)
    to match the framework's execution model."""
    if jax.process_count() == 1:
        return
    mesh = create_mesh()
    total = jax.jit(shard_map_fn(
        lambda v: jax.lax.psum(v, "data"), mesh,
        in_specs=P("data"), out_specs=P()))(
            jax.device_put(
                np.ones(mesh.devices.size, np.float32),
                jax.sharding.NamedSharding(mesh, P("data"))))
    assert int(np.asarray(total)[0]) == jax.device_count()
