"""Training wrappers: episode bookkeeping, vmap, auto-reset, eval metrics.

Behavioral equivalents of brax.envs.training.{EpisodeWrapper, VmapWrapper,
AutoResetWrapper, EvalWrapper} as used by the reference trainer
(/root/reference/ppo_imitation/train.py:205-218, acting.py:109).

Deviation (documented): brax's AutoResetWrapper restores only
pipeline_state/obs on done, leaving env bookkeeping in ``state.info``
(e.g. the rodent's cur_frame/sub_clip_frame) running — which degenerates
tracking episodes after the first sub-clip.  Our wrapper additionally
snapshots and restores the whole ``info`` dict by default
(``restore_info=True``); pass False for bug-compatible brax behavior.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from vnl_tpu.envs.base import Env, State


class Wrapper(Env):
    def __init__(self, env: Env):
        self.env = env

    def reset(self, rng, **kw):
        # extra reset kwargs (e.g. the multi-clip env's clip_weights) pass
        # through the whole wrapper stack as traced values
        return self.env.reset(rng, **kw)

    def step(self, state, action):
        return self.env.step(state, action)

    @property
    def observation_size(self):
        return self.env.observation_size

    @property
    def action_size(self):
        return self.env.action_size

    @property
    def unwrapped(self):
        return self.env.unwrapped

    def __getattr__(self, name):
        if name == "env":
            raise AttributeError(name)
        return getattr(self.env, name)


class EpisodeWrapper(Wrapper):
    """Maintains episode step count and truncation signal."""

    def __init__(self, env: Env, episode_length: int, action_repeat: int = 1):
        super().__init__(env)
        self.episode_length = episode_length
        self.action_repeat = action_repeat

    def reset(self, rng, **kw):
        state = self.env.reset(rng, **kw)
        state.info["steps"] = jnp.zeros((), jnp.float32)
        state.info["truncation"] = jnp.zeros((), jnp.float32)
        return state

    def step(self, state, action):
        def f(state, _):
            nstate = self.env.step(state, action)
            return nstate, nstate.reward

        state, rewards = jax.lax.scan(f, state, (), self.action_repeat)
        state = state.replace(reward=jnp.sum(rewards, axis=0))
        steps = state.info["steps"] + self.action_repeat
        one = jnp.ones_like(state.done)
        zero = jnp.zeros_like(state.done)
        episode_length = jnp.array(self.episode_length, dtype=jnp.float32)
        done = jnp.where(steps >= episode_length, one, state.done)
        state.info["truncation"] = jnp.where(
            steps >= episode_length, 1 - state.done, zero)
        state.info["steps"] = steps
        return state.replace(done=done)


class VmapWrapper(Wrapper):
    """Batches reset/step over a leading env axis."""

    def __init__(self, env: Env, batch_size: int | None = None):
        super().__init__(env)
        self.batch_size = batch_size

    def reset(self, rng, **kw):
        if self.batch_size is not None and rng.ndim == 1:
            rng = jax.random.split(rng, self.batch_size)
        # kwargs (traced values) broadcast: closed over, not vmapped
        return jax.vmap(lambda r: self.env.reset(r, **kw))(rng)

    def step(self, state, action):
        return jax.vmap(self.env.step)(state, action)


class AutoResetWrapper(Wrapper):
    """Restores the initial state when an episode ends.

    Like brax, the restore target is the state captured at reset() time (no
    new randomness inside the compiled step).

    Unlike brax, the snapshot holds only the CARRIED physics state
    (qpos, qvel, act): every other Data field is recomputed from those by
    forward() before anything reads it, so snapshotting the full pytree
    (~100 KB/env — qM/qMinv/qMhBinv/cinert dominate) would just burn HBM
    and where-select bandwidth every step.  Restoring obs is handled via
    the stored first_obs; reward/done of the terminal step are computed
    before the restore, exactly as in brax.
    """

    _CARRIED = ("qpos", "qvel", "act")

    def __init__(self, env: Env, restore_info: bool = True):
        super().__init__(env)
        self._restore_info = restore_info

    def reset(self, rng, **kw):
        state = self.env.reset(rng, **kw)
        ps = state.pipeline_state
        if all(hasattr(ps, k) for k in self._CARRIED):
            snap = {k: getattr(ps, k) for k in self._CARRIED}
        else:  # non-Data pipeline states: brax-faithful full snapshot
            snap = ps
        state.info["first_pipeline_state"] = snap
        state.info["first_obs"] = state.obs
        if self._restore_info:
            snapshot = {k: v for k, v in state.info.items()
                        if k not in ("first_pipeline_state", "first_obs",
                                     "first_info", "steps", "truncation")}
            state.info["first_info"] = snapshot
        return state

    def step(self, state, action):
        if "steps" in state.info:
            steps = state.info["steps"]
            steps = jnp.where(state.done, jnp.zeros_like(steps), steps)
            state.info.update(steps=steps)
        state = state.replace(done=jnp.zeros_like(state.done))
        state = self.env.step(state, action)

        def where_done(x, y):
            done = state.done
            if done.shape:
                done = jnp.reshape(done, [x.shape[0]] + [1] * (len(x.shape) - 1))
            return jnp.where(done, x, y)

        snap = state.info["first_pipeline_state"]
        if isinstance(snap, dict):
            restored = {k: jax.tree_util.tree_map(
                where_done, v, getattr(state.pipeline_state, k))
                for k, v in snap.items()}
            pipeline_state = state.pipeline_state.replace(**restored)
        else:
            pipeline_state = jax.tree_util.tree_map(
                where_done, snap, state.pipeline_state)
        obs = where_done(state.info["first_obs"], state.obs)
        if self._restore_info and "first_info" in state.info:
            for k, v in state.info["first_info"].items():
                state.info[k] = jax.tree_util.tree_map(
                    where_done, v, state.info[k])
        return state.replace(pipeline_state=pipeline_state, obs=obs)


@struct.dataclass
class EvalMetrics:
    episode_metrics: dict
    active_episodes: jax.Array
    episode_steps: jax.Array


class EvalWrapper(Wrapper):
    """Accumulates per-episode metric sums for the evaluator
    (brax EvalWrapper semantics, acting.py:109)."""

    def reset(self, rng, **kw):
        reset_state = self.env.reset(rng, **kw)
        reset_state.metrics["reward"] = reset_state.reward
        eval_metrics = EvalMetrics(
            episode_metrics=jax.tree_util.tree_map(
                jnp.zeros_like, reset_state.metrics),
            active_episodes=jnp.ones_like(reset_state.reward),
            episode_steps=jnp.zeros_like(reset_state.reward),
        )
        reset_state.info["eval_metrics"] = eval_metrics
        return reset_state

    def step(self, state, action):
        state_metrics = state.info["eval_metrics"]
        del state.info["eval_metrics"]
        nstate = self.env.step(state, action)
        nstate.metrics["reward"] = nstate.reward
        episode_steps = jnp.where(
            state_metrics.active_episodes,
            nstate.info.get("steps", state_metrics.episode_steps),
            state_metrics.episode_steps)
        episode_metrics = jax.tree_util.tree_map(
            lambda a, b: a + b * state_metrics.active_episodes,
            state_metrics.episode_metrics, nstate.metrics)
        active_episodes = state_metrics.active_episodes * (1 - nstate.done)
        eval_metrics = EvalMetrics(
            episode_metrics=episode_metrics,
            active_episodes=active_episodes,
            episode_steps=episode_steps)
        nstate.info["eval_metrics"] = eval_metrics
        return nstate


def wrap_for_training(env: Env, episode_length: int = 1000,
                      action_repeat: int = 1,
                      restore_info: bool = True) -> Env:
    """EpisodeWrapper -> VmapWrapper -> AutoResetWrapper stack
    (brax.envs.training.wrap order)."""
    env = EpisodeWrapper(env, episode_length, action_repeat)
    env = VmapWrapper(env)
    env = AutoResetWrapper(env, restore_info=restore_info)
    return env
