"""Running observation statistics with cross-device reduction.

Welford-style streaming mean/std (brax.training.acme.running_statistics
semantics, used by the reference at ppo_imitation/train.py:222,330-334).
The update reduces over all leading batch dims; pass ``axis_name`` to psum
across a mesh/pmap axis so every device keeps identical statistics.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class RunningStatisticsState:
    count: jax.Array          # scalar
    mean: jax.Array           # feature-shaped
    summed_variance: jax.Array  # feature-shaped (M2)
    std: jax.Array            # feature-shaped


def init_state(shape, dtype=jnp.float32) -> RunningStatisticsState:
    if hasattr(shape, "shape"):
        shape = shape.shape
    return RunningStatisticsState(
        count=jnp.zeros((), jnp.float32),
        mean=jnp.zeros(shape, dtype),
        summed_variance=jnp.zeros(shape, dtype),
        std=jnp.ones(shape, dtype),
    )


def update(state: RunningStatisticsState, batch: jax.Array,
           axis_name: Optional[str] = None,
           pmap_axis_name: Optional[str] = None) -> RunningStatisticsState:
    """Folds a batch of observations into the statistics."""
    axis_name = axis_name or pmap_axis_name
    feature_ndim = state.mean.ndim
    batch_axes = tuple(range(batch.ndim - feature_ndim))
    batch_count = jnp.asarray(
        jnp.prod(jnp.asarray(batch.shape[: batch.ndim - feature_ndim])),
        jnp.float32)
    batch_sum = jnp.sum(batch, axis=batch_axes)
    if axis_name is not None:
        batch_count = jax.lax.psum(batch_count, axis_name)
        batch_sum = jax.lax.psum(batch_sum, axis_name)

    count = state.count + batch_count
    diff_to_old_mean = batch - state.mean
    mean = state.mean + batch_sum / count - (
        state.mean * batch_count / count)
    # recompute against updated mean (Chan parallel update)
    diff_to_new_mean = batch - mean
    var_update = jnp.sum(diff_to_old_mean * diff_to_new_mean, axis=batch_axes)
    if axis_name is not None:
        var_update = jax.lax.psum(var_update, axis_name)
    summed_variance = state.summed_variance + var_update
    std = jnp.sqrt(jnp.maximum(summed_variance / count, 0.0) + 1e-6)
    return RunningStatisticsState(
        count=count, mean=mean, summed_variance=summed_variance, std=std)


def normalize(batch: jax.Array,
              state: RunningStatisticsState) -> jax.Array:
    return (batch - state.mean) / state.std


def denormalize(batch: jax.Array,
                state: RunningStatisticsState) -> jax.Array:
    return batch * state.std + state.mean
