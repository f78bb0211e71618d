"""Rich per-eval callback: checkpoint, rollout diagnostics, overlay video.

Equivalent of the reference driver's policy_params_fn
(/root/reference/train.py:154-331): saves params, runs a deterministic
rollout on the eval env, logs per-step diagnostic series (rtrunk curve,
per-actuator action mean/std, behaviour-vs-random log-prob, reward — as
plots, matching the reference's wandb line_series at train.py:190-272),
and renders the agent-vs-reference ghost overlay video.

TPU-first deviation: the reference steps the eval episode in a host Python
loop (one dispatch per step).  Here the whole episode is ONE jitted
lax.scan taking params as an argument — it compiles once per callback
instance and each eval costs a single device program, so the eval tail no
longer drags wall-average throughput (round-2 measured ~2x drag from the
host loop).
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
                 render: bool = True, plots: bool = True):
        self._env = env
        self._make_policy = make_policy
        self._model_path = model_path
        self._logger = logger
        self._episode_length = episode_length
        self._render_every = render_every
        self._render = render
        self._plots = plots
        self._calls = 0
        self._rollout = jax.jit(self._build_rollout())
        # overlay rendering is host-side numpy rasterization (~60-80 s per
        # eval at 320x240x150 frames) — run it on one worker thread so it
        # overlaps the next training interval instead of stalling it
        # (measured wall/in-program sps ratio 0.77 with synchronous render)
        import concurrent.futures
        self._render_pool = concurrent.futures.ThreadPoolExecutor(
            max_workers=1)
        self._pending_render = None

    def _build_rollout(self):
        env = self._env
        length = self._episode_length

        def rollout(params, rng):
            det_policy = self._make_policy(params, deterministic=True)
            stoch_policy = self._make_policy(params)
            rng, reset_key = jax.random.split(rng)
            state = env.reset(reset_key)
            start_frame = jnp.asarray(
                state.info.get("cur_frame", 0), jnp.int32)
            # multi-clip envs sample a clip per episode; the overlay must
            # render the clip THIS rollout tracked (clip_id -1 = single-clip)
            clip_id = jnp.asarray(state.info.get("clip_id", -1), jnp.int32)

            def body(carry, _):
                state, rng = carry
                rng, key = jax.random.split(rng)
                act, _ = det_policy(state.info["traj"], state.obs, key)
                _, extras = stoch_policy(state.info["traj"], state.obs, key)
                state = env.step(state, act)
                out = {
                    "qpos": state.pipeline_state.qpos,
                    "rtrunk": jnp.asarray(
                        state.info.get("termination_error", 0.0)),
                    "reward": state.reward,
                    "action": act,
                }
                if extras:
                    out["log_prob"] = extras["log_prob"]
                    out["rand_log_prob"] = extras["rand_log_prob"]
                return (state, rng), out

            _, traj = jax.lax.scan(body, (state, rng), (), length=length)
            return start_frame, clip_id, traj

        return rollout

    def __call__(self, num_steps: int, make_policy, params) -> dict:
        os.makedirs(self._model_path, exist_ok=True)
        ckpt_lib.save_params(
            os.path.join(self._model_path, str(num_steps)), params)

        start_frame, clip_id, traj = jax.device_get(
            self._rollout(params, jax.random.PRNGKey(self._calls)))
        rtrunk = np.asarray(traj["rtrunk"], np.float64)
        rewards = np.asarray(traj["reward"], np.float64)
        actions = np.asarray(traj["action"], np.float64)

        series = {
            "diag/rtrunk_min": float(rtrunk.min()),
            "diag/rtrunk_mean": float(rtrunk.mean()),
            "diag/episode_reward_det": float(rewards.sum()),
            "diag/action_mean": float(actions.mean()),
            "diag/action_std": float(actions.std()),
        }
        if "log_prob" in traj:
            series["diag/log_prob"] = float(np.mean(traj["log_prob"]))
            series["diag/rand_log_prob"] = float(
                np.mean(traj["rand_log_prob"]))
        if self._plots:
            try:
                series["diag/plots"] = self._render_plots(traj, num_steps)
            except Exception as e:  # plotting must never kill training
                series["diag/plots_error"] = str(e)
        if self._logger is not None:
            self._logger.log(series, step=num_steps)

        if self._render and self._calls % self._render_every == 0:
            # skip if the previous eval's render is still running (pileup
            # guard: rendering must never fall behind training)
            if self._pending_render is None or self._pending_render.done():
                qpos = np.asarray(traj["qpos"])
                sf, cid = int(start_frame), int(clip_id)

                def _job():
                    try:
                        return self._render_overlay(qpos, sf, num_steps, cid)
                    except Exception as e:  # never kill training
                        return f"render-error: {e}"

                self._pending_render = self._render_pool.submit(_job)
                series["diag/video"] = os.path.join(
                    self._model_path, f"rollout_{num_steps}.mp4")
                series["diag/video_async"] = True
            else:
                series["diag/video_skipped"] = "previous render in flight"
        self._calls += 1
        return series

    def _render_plots(self, traj, num_steps: int) -> str:
        """Reference-parity eval plot set (/root/reference/train.py:190-272):
        per-actuator action mean/std across the episode, reward curve,
        rtrunk curve, behaviour-vs-random log-prob curves — one PNG in the
        run dir (wandb-free environments keep the artifacts)."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        actions = np.asarray(traj["action"], np.float64)
        t = np.arange(actions.shape[0])
        fig, axes = plt.subplots(2, 2, figsize=(11, 7))

        ax = axes[0][0]
        mean, std = actions.mean(axis=0), actions.std(axis=0)
        idx = np.arange(actions.shape[1])
        ax.bar(idx, mean, yerr=std, color="#4c72b0", ecolor="#aaaaaa")
        ax.set_title("per-actuator action mean ± std")
        ax.set_xlabel("actuator")

        ax = axes[0][1]
        ax.plot(t, np.asarray(traj["reward"]), label="reward")
        ax.set_title("reward per step (deterministic rollout)")
        ax.set_xlabel("t")
        ax.legend()

        ax = axes[1][0]
        ax.plot(t, np.asarray(traj["rtrunk"]), color="#c44e52")
        ax.set_title("rtrunk (termination error)")
        ax.set_xlabel("t")

        ax = axes[1][1]
        if "log_prob" in traj:
            ax.plot(t, np.asarray(traj["log_prob"]), label="log_prob")
            ax.plot(t, np.asarray(traj["rand_log_prob"]),
                    label="rand_log_prob")
            ax.legend()
        ax.set_title("behaviour vs random log-prob")
        ax.set_xlabel("t")

        fig.suptitle(f"eval diagnostics @ {num_steps:,} steps")
        fig.tight_layout()
        out = os.path.join(self._model_path, f"diag_{num_steps}.png")
        fig.savefig(out, dpi=100)
        plt.close(fig)
        if self._logger is not None and self._logger._wandb is not None:
            self._logger._wandb.log(
                {"diag/plots_img": self._logger._wandb.Image(out)},
                step=num_steps)
        return out

    def _resolve_ref_clip(self, clip_id: int = -1):
        """The single-clip envs store the clip under different names
        (_ref_traj in humanoid/ant, _ref_clip in rodent); multi-clip envs
        expose _get_clip(info) keyed by the clip_id the eval episode
        actually sampled (round-3 bug: _get_clip({}) KeyError'd for the
        multi-clip env, silently disabling its overlay)."""
        env = self._env
        for name in ("_ref_traj", "_ref_clip"):
            ref = getattr(env, name, None)
            if ref is not None:
                return ref
        getter = getattr(env, "_get_clip", None)
        if getter is not None:
            try:
                return getter({"clip_id": max(clip_id, 0)})
            except Exception:
                return None
        return None

    def _render_overlay(self, qpos_rollout: np.ndarray, start_frame: int,
                        num_steps: int, clip_id: int = -1) -> Optional[str]:
        from vnl_tpu.render import render_overlay_video
        env = self._env
        ref = self._resolve_ref_clip(clip_id)
        if ref is None:
            return None
        T = qpos_rollout.shape[0]
        sl = slice(start_frame, start_frame + T)
        qreferences = np.concatenate(
            [np.asarray(ref.position)[sl], np.asarray(ref.quaternion)[sl],
             np.asarray(ref.joints)[sl]], axis=1)
        n = min(len(qreferences), T)
        out = os.path.join(self._model_path, f"rollout_{num_steps}.mp4")
        return render_overlay_video(env.sys, qpos_rollout[:n],
                                    qreferences[:n], out)
