"""Mesh / collective utilities for ICI+DCN scale-out.

The reference's distributed story is pmap-based DP (SURVEY.md §2.4); here
the same three levels (vmapped envs per chip, DP across chips, DP across
hosts) are expressed TPU-natively with one jax.sharding.Mesh + shard_map:
collectives (psum/pmean for gradients and normalizer stats) ride ICI within
a slice and DCN across slices, chosen by mesh axis order.
"""

from vnl_tpu.parallel.mesh import (
    create_mesh,
    data_parallel_specs,
    shard_map_fn,
    assert_is_replicated,
    synchronize_hosts,
)
