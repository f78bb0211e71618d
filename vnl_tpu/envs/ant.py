"""Ant tracking env — the debug-scale config of the tracking stack.

Re-implements /root/reference/envs/ant.py (AntTracking :25-438): unlike the
rodent/humanoid, the reference-trajectory features are concatenated INTO the
observation (no separate traj pathway), and the start frame is fixed at 0.
Also provides a static reference clip generator for self-contained tests
(the reference's ant clip pickle is not shipped).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vnl_tpu import math as vmath
from vnl_tpu import mjcf, physics
from vnl_tpu.data.reference_clip import ReferenceClip
from vnl_tpu.envs.base import PipelineEnv, State
from vnl_tpu.envs.registry import register_environment

_ANT_XML = "/root/reference/assets/ant.xml"


def make_still_clip(model, clip_length: int = 250,
                    dtype=jnp.float32) -> ReferenceClip:
    """Static 'stand still' reference clip (notebooks' ant_traj_still
    analogue): the default pose held for clip_length frames."""
    d = physics.make_data(model, dtype=dtype)
    d = physics.kinematics(model, d)
    T = clip_length
    tile = lambda x: jnp.tile(x[None], (T,) + (1,) * x.ndim)
    qpos0 = model.qpos0.astype(dtype)
    com = jnp.sum(model.body_mass[:, None] * d.xipos, axis=0) / jnp.sum(
        model.body_mass)
    return ReferenceClip(
        position=tile(qpos0[:3]),
        quaternion=tile(qpos0[3:7]),
        joints=tile(qpos0[7:]),
        body_positions=tile(d.xpos),
        body_quaternions=tile(d.xquat),
        velocity=jnp.zeros((T, 3), dtype),
        joints_velocity=jnp.zeros((T, model.nq - 7), dtype),
        angular_velocity=jnp.zeros((T, 3), dtype),
        center_of_mass=tile(com),
    )


class AntTracking(PipelineEnv):
    def __init__(
        self,
        reference_clip: Optional[ReferenceClip] = None,
        solver: str = "newton",
        iterations: int = 1,
        ls_iterations: int = 4,
        healthy_z_range: Tuple[float, float] = (0.2, 1.0),
        reset_noise_scale: float = 1e-2,
        clip_length: int = 250,
        episode_length: int = 150,
        ref_traj_length: int = 5,
        termination_threshold: float = 0.9,
        body_error_multiplier: float = 1.0,
        physics_steps_per_control_step: int = 5,
        dtype=jnp.float32,
        **kwargs,
    ):
        model = mjcf.load_model(
            _ANT_XML,
            overrides={"solver": solver, "iterations": iterations,
                       "ls_iterations": ls_iterations},
            dtype=dtype)
        super().__init__(model, n_frames=kwargs.get(
            "n_frames", physics_steps_per_control_step))
        self._termination_threshold = termination_threshold
        self._healthy_z_range = healthy_z_range
        self._reset_noise_scale = reset_noise_scale
        self._body_error_multiplier = body_error_multiplier
        self._clip_length = clip_length
        self._episode_length = episode_length
        self._ref_traj_length = ref_traj_length
        if reference_clip is None:
            reference_clip = make_still_clip(model, clip_length, dtype)
        self._ref_traj = reference_clip
        if self._episode_length > self._clip_length:
            raise ValueError("episode_length cannot be greater than clip_length!")

    def reset(self, rng: jax.Array) -> State:
        # fixed start frame (envs/ant.py:88)
        return self.reset_to_frame(jnp.zeros((), jnp.int32))

    def reset_to_frame(self, start_frame) -> State:
        ref = self._ref_traj
        qpos = jnp.concatenate([
            ref.position[start_frame], ref.quaternion[start_frame],
            ref.joints[start_frame]])
        qvel = jnp.concatenate([
            ref.velocity[start_frame], ref.angular_velocity[start_frame],
            ref.joints_velocity[start_frame]])
        data = self.pipeline_init(qpos, qvel)
        info = {"cur_frame": jnp.asarray(start_frame, jnp.int32)}
        obs = self._get_obs(data, jnp.zeros(self.sys.nu), info)
        # keep a "traj" entry so the shared intention-PPO stack can route a
        # (redundant) traj pathway uniformly; the reference trains ant via
        # notebooks only (SURVEY.md §2.5)
        info["traj"] = obs[: self._traj_size()]
        reward, done, zero = jnp.zeros(3)
        metrics = {"rcom": zero, "rvel": zero, "rtrunk": zero, "rquat": zero,
                   "ract": zero, "termination_error": zero}
        state = State(data, obs, reward, done, metrics, info)
        info["termination_error"] = self._calculate_termination(state)
        return state.replace(info=info)

    def _traj_size(self) -> int:
        nb = self._ref_traj.body_positions.shape[1]
        return self._ref_traj_length * (nb * 6 + 3 + (self.sys.nq - 7))

    def step(self, state: State, action: jax.Array) -> State:
        data = self.pipeline_step(state.pipeline_state, action)
        info = dict(state.info)
        obs = self._get_obs(data, action, state.info)
        rcom, rvel, rtrunk, rquat, ract, is_healthy = self._calculate_reward(
            state, action)
        total_reward = (0.05 * rcom + 0.01 * rvel + 0.20 * rtrunk
                        + 0.01 * rquat + 0.001 * ract)
        info["termination_error"] = rtrunk
        info["cur_frame"] = info["cur_frame"] + 1
        info["traj"] = obs[: self._traj_size()]
        done = jnp.where(rtrunk < 0, 1.0, 0.0)
        done = jnp.maximum(done, 1.0 - is_healthy)
        # posinf/neginf=0: +-3.4e38 would poison the obs-normalizer stats
        reward = jnp.nan_to_num(total_reward, posinf=0.0, neginf=0.0)
        obs = jnp.nan_to_num(obs, posinf=0.0, neginf=0.0)
        bad = jnp.logical_not(jnp.all(jnp.isfinite(data.qpos))
                              & jnp.all(jnp.isfinite(data.qvel))
                              & jnp.all(jnp.isfinite(data.qacc)))
        done = jnp.where(bad, 1.0, done)
        state.metrics.update(rcom=rcom, rvel=rvel, rquat=rquat, ract=ract,
                             rtrunk=rtrunk, termination_error=rtrunk)
        return state.replace(pipeline_state=data, obs=obs, reward=reward,
                             done=done, info=info)

    def _calculate_termination(self, state):
        data = state.pipeline_state
        frame = state.info["cur_frame"]
        ref = self._ref_traj
        error_joints = jnp.mean(jnp.abs(ref.joints[frame] - data.qpos[7:]))
        error_bodies = jnp.mean(jnp.abs(ref.body_positions[frame] - data.xpos))
        error = (0.5 * self._body_error_multiplier * error_bodies
                 + 0.5 * error_joints)
        return 1.0 - error / self._termination_threshold

    def _calculate_reward(self, state, action):
        data = state.pipeline_state
        frame = state.info["cur_frame"]
        ref = self._ref_traj
        com_ref = (ref.center_of_mass[frame] if ref.center_of_mass is not None
                   else ref.position[frame])
        rcom = jnp.exp(-100.0 * jnp.linalg.norm(data.subtree_com[1] - com_ref))
        qvel_ref = jnp.concatenate([
            ref.velocity[frame], ref.angular_velocity[frame],
            ref.joints_velocity[frame]])
        rvel = jnp.exp(-0.1 * jnp.linalg.norm(data.qvel - qvel_ref))
        rtrunk = self._calculate_termination(state)
        rquat = jnp.exp(-2.0 * jnp.linalg.norm(
            vmath.bounded_quat_dist(data.qpos[3:7], ref.quaternion[frame])))
        ract = 0.01 * -0.015 * jnp.sum(jnp.square(action)) / len(action)
        z = data.qpos[2]
        is_healthy = jnp.where(z < self._healthy_z_range[0], 0.0, 1.0)
        is_healthy = jnp.where(z > self._healthy_z_range[1], 0.0, is_healthy)
        return rcom, rvel, rtrunk, rquat, ract, is_healthy

    def _get_obs(self, data, action, info) -> jax.Array:
        """Traj features concatenated into obs (envs/ant.py:293-340)."""
        window = self._ref_traj.slice(info["cur_frame"] + 1,
                                      self._ref_traj_length)
        xmat_root = data.xmat[1]
        diff_bodies = window.body_positions - data.xpos[None]
        rel_local = (diff_bodies @ xmat_root).ravel()
        rel_global = diff_bodies.ravel()
        rel_root = ((window.position - data.qpos[:3]) @ xmat_root).ravel()
        rel_joints = (window.joints - data.qpos[7:]).ravel()
        return jnp.concatenate([
            rel_local, rel_global, rel_root, rel_joints,
            data.qpos, data.qvel])


register_environment("ant", lambda **kw: AntTracking(**kw))
