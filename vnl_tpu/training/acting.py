"""Rollout collection and periodic evaluation.

Behavioral spec from /root/reference/ppo_imitation/acting.py: the policy is
called with the reference-trajectory features held in state.info["traj"]
alongside the proprioceptive obs (ref :47); unrolls are lax.scan programs;
the Evaluator wraps the eval env in EvalWrapper and aggregates per-episode
metrics with mean/std suffixes (ref :139-154).
"""

from __future__ import annotations

import time
from typing import Callable, Sequence, Tuple

import jax
import numpy as np

from vnl_tpu.envs.base import Env, State
from vnl_tpu.envs.wrappers import EvalWrapper
from vnl_tpu.training.types import Metrics, Transition


def actor_step(env: Env, env_state: State, policy, key,
               extra_fields: Sequence[str] = ()) -> Tuple[State, Transition]:
    """One policy query + one env step, packed as a Transition."""
    action, policy_extras = policy(
        env_state.info["traj"], env_state.obs, key)
    next_state = env.step(env_state, action)
    return next_state, Transition(
        observation=env_state.obs,
        action=action,
        reward=next_state.reward,
        discount=1.0 - next_state.done,
        next_observation=next_state.obs,
        extras={
            "policy_extras": policy_extras,
            "state_extras": {k: next_state.info[k] for k in extra_fields},
        },
    )


def generate_unroll(env: Env, env_state: State, policy, key,
                    unroll_length: int,
                    extra_fields: Sequence[str] = ()) -> Tuple[State, Transition]:
    """unroll_length sequential actor steps as one scan; returns the final
    state and the stacked (time-leading) Transition."""

    def one_step(carry, _):
        state, k = carry
        step_key, k = jax.random.split(k)
        state, transition = actor_step(env, state, policy, step_key,
                                       extra_fields=extra_fields)
        return (state, k), transition

    (final_state, _), rollout = jax.lax.scan(
        one_step, (env_state, key), (), length=unroll_length)
    return final_state, rollout


class Evaluator:
    """Runs full-episode evaluations on a dedicated wrapped env."""

    def __init__(self, eval_env: Env, eval_policy_fn: Callable,
                 num_eval_envs: int, episode_length: int, action_repeat: int,
                 key):
        self._key = key
        self._walltime = 0.0
        self._episode_steps = episode_length * num_eval_envs
        wrapped = EvalWrapper(eval_env)
        steps = episode_length // action_repeat

        def run_episodes(policy_params, rng):
            first_state = wrapped.reset(jax.random.split(rng, num_eval_envs))
            last_state, _ = generate_unroll(
                wrapped, first_state, eval_policy_fn(policy_params), rng,
                unroll_length=steps)
            return last_state

        self._run_episodes = jax.jit(run_episodes)

    def run_evaluation(self, policy_params, training_metrics: Metrics,
                       aggregate_episodes: bool = True) -> Metrics:
        self._key, eval_key = jax.random.split(self._key)
        start = time.time()
        state = self._run_episodes(policy_params, eval_key)
        tallies = state.info["eval_metrics"]
        tallies.active_episodes.block_until_ready()
        elapsed = time.time() - start
        self._walltime += elapsed

        out = {"eval/walltime": self._walltime, **training_metrics}
        for name, per_episode in tallies.episode_metrics.items():
            per_episode = np.asarray(per_episode)
            if aggregate_episodes:
                out[f"eval/episode_{name}"] = np.mean(per_episode)
                out[f"eval/episode_{name}_std"] = np.std(per_episode)
            else:
                out[f"eval/episode_{name}"] = per_episode
        out["eval/avg_episode_length"] = float(
            np.mean(np.asarray(tallies.episode_steps)))
        # multi-clip envs: per-clip episode reward (clip_id is stable per
        # episode — the AutoReset info snapshot restores it), so a clip the
        # policy fails on is visible instead of averaged away
        clip_ids = state.info.get("clip_id")
        if clip_ids is not None and aggregate_episodes:
            ids = np.asarray(clip_ids)
            rew = np.asarray(tallies.episode_metrics["reward"])
            for cid in np.unique(ids):
                out[f"eval/episode_reward_clip{int(cid)}"] = float(
                    np.mean(rew[ids == cid]))
        out["eval/epoch_eval_time"] = elapsed
        out["eval/sps"] = self._episode_steps / elapsed
        return out
