"""Env base classes (brax PipelineEnv/State equivalents, TPU-first).

State is a pytree; Env methods are pure functions of (state, action) so the
whole rollout compiles into one XLA program under scan/vmap/shard_map.
"""

from __future__ import annotations

import abc
from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import struct

from vnl_tpu import physics
from vnl_tpu.physics.model import Data, Model


@struct.dataclass
class State:
    """Env state pytree (mirrors brax.envs.base.State)."""

    pipeline_state: Data
    obs: jax.Array
    reward: jax.Array
    done: jax.Array
    metrics: Dict[str, jax.Array] = struct.field(default_factory=dict)
    info: Dict[str, Any] = struct.field(default_factory=dict)


class Env(abc.ABC):
    """Abstract env interface."""

    @abc.abstractmethod
    def reset(self, rng: jax.Array) -> State:
        ...

    @abc.abstractmethod
    def step(self, state: State, action: jax.Array) -> State:
        ...

    @property
    @abc.abstractmethod
    def observation_size(self) -> int:
        ...

    @property
    @abc.abstractmethod
    def action_size(self) -> int:
        ...

    @property
    def unwrapped(self) -> "Env":
        return self


class PipelineEnv(Env):
    """Env driven by the vnl_tpu physics engine with n_frames substeps.

    Equivalent of brax PipelineEnv with backend="mjx"
    (/root/reference/envs/rodent.py:97-102): each control step runs
    ``n_frames`` physics steps at the model timestep.
    """

    def __init__(self, model: Model, n_frames: int = 1):
        self._model = model
        self._n_frames = n_frames

    @property
    def sys(self) -> Model:
        return self._model

    @property
    def model(self) -> Model:
        return self._model

    @property
    def dt(self) -> float:
        """Control timestep (physics dt * substeps)."""
        return self._model.opt.timestep * self._n_frames

    @property
    def n_frames(self) -> int:
        return self._n_frames

    @property
    def action_size(self) -> int:
        return self._model.nu

    @property
    def observation_size(self) -> int:
        rng = jax.random.PRNGKey(0)
        shape = jax.eval_shape(self.reset, rng).obs.shape
        return int(shape[-1])

    def pipeline_init(self, qpos: jax.Array, qvel: jax.Array,
                      act: jax.Array | None = None) -> Data:
        d = physics.make_data(self._model, dtype=qpos.dtype)
        d = d.replace(qpos=qpos, qvel=qvel)
        if act is not None:
            d = d.replace(act=act)
        return physics.forward(self._model, d)

    def pipeline_step(self, data: Data, ctrl: jax.Array) -> Data:
        """Runs n_frames physics substeps.

        The mass matrix depends only on qpos (drift ~dt·|qvel| between
        substeps), so later substeps MAY refine the carried inverses by
        Newton–Schulz instead of refactoring (physics.inertia.crb).  With
        the fused position megakernel the exact stacked Schur sweep is
        cheaper than the refine matmuls (tools/ablate_step.py r2: 3.57 vs
        3.93 ms/substep), so refine is only used on the XLA path."""
        from vnl_tpu.ops import pallas_position
        refine = not pallas_position.enabled()
        data = data.replace(ctrl=ctrl)
        data = physics.step(self._model, data)

        def substep(d, _):
            return physics.step(self._model, d, refine_inverse=refine), ()

        if self._n_frames > 1:
            data, _ = jax.lax.scan(substep, data, (),
                                   length=self._n_frames - 1)
        return data
