"""Rich per-eval callback: checkpoint, rollout diagnostics, overlay video.

Equivalent of the reference driver's policy_params_fn
(/root/reference/train.py:154-331): saves params, runs a deterministic host
rollout on the eval env, logs per-step diagnostic series (rtrunk curve,
action mean/std, behaviour-vs-random log-prob, reward), and renders the
agent-vs-reference ghost overlay video.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vnl_tpu.training import checkpoint as ckpt_lib


class EvalCallback:
    def __init__(self, env, make_policy, model_path: str, logger=None,
                 episode_length: int = 150, render_every: int = 1,
                 render: bool = True):
        self._env = env
        self._make_policy = make_policy
        self._model_path = model_path
        self._logger = logger
        self._episode_length = episode_length
        self._render_every = render_every
        self._render = render
        self._calls = 0
        self._jit_reset = jax.jit(env.reset)
        self._jit_step = jax.jit(env.step)

    def __call__(self, num_steps: int, make_policy, params) -> dict:
        os.makedirs(self._model_path, exist_ok=True)
        ckpt_lib.save_params(
            os.path.join(self._model_path, str(num_steps)), params)

        policy = jax.jit(self._make_policy(params, deterministic=True))
        rng = jax.random.PRNGKey(self._calls)
        state = self._jit_reset(rng)
        rollout_qpos, rtrunk, rewards, actions, log_probs = [], [], [], [], []
        stoch_policy = jax.jit(self._make_policy(params))
        for t in range(self._episode_length):
            rng, key = jax.random.split(rng)
            act, _ = policy(state.info["traj"], state.obs, key)
            _, extras = stoch_policy(state.info["traj"], state.obs, key)
            state = self._jit_step(state, act)
            rollout_qpos.append(np.asarray(state.pipeline_state.qpos))
            rtrunk.append(float(state.info.get("termination_error", 0.0)))
            rewards.append(float(state.reward))
            actions.append(np.asarray(act))
            if extras:
                log_probs.append((float(extras["log_prob"]),
                                  float(extras["rand_log_prob"])))

        actions = np.stack(actions)
        series = {
            "diag/rtrunk_min": float(np.min(rtrunk)),
            "diag/rtrunk_mean": float(np.mean(rtrunk)),
            "diag/episode_reward_det": float(np.sum(rewards)),
            "diag/action_mean": float(actions.mean()),
            "diag/action_std": float(actions.std()),
        }
        if log_probs:
            lp = np.asarray(log_probs)
            series["diag/log_prob"] = float(lp[:, 0].mean())
            series["diag/rand_log_prob"] = float(lp[:, 1].mean())
        if self._logger is not None:
            self._logger.log(series, step=num_steps)

        if self._render and self._calls % self._render_every == 0:
            try:
                video = self._render_overlay(np.stack(rollout_qpos), num_steps)
                series["diag/video"] = video
            except Exception as e:  # rendering must never kill training
                series["diag/video_error"] = str(e)
        self._calls += 1
        return series

    def _render_overlay(self, qpos_rollout: np.ndarray,
                        num_steps: int) -> Optional[str]:
        from vnl_tpu.render import render_overlay_video
        env = self._env
        ref = getattr(env, "_ref_traj", None)
        if ref is None:
            return None
        T = qpos_rollout.shape[0]
        qreferences = np.concatenate(
            [np.asarray(ref.position)[:T], np.asarray(ref.quaternion)[:T],
             np.asarray(ref.joints)[:T]], axis=1)
        out = os.path.join(self._model_path, f"rollout_{num_steps}.mp4")
        return render_overlay_video(env.sys, qpos_rollout, qreferences, out)
