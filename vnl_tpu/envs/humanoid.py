"""CMU-humanoid environments: mocap tracking + standing task.

Re-implements /root/reference/envs/humanoid.py (HumanoidTracking
:25-466, HumanoidStanding :469-607) on the first-party engine.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vnl_tpu import math as vmath
from vnl_tpu import mjcf
from vnl_tpu.data.reference_clip import ReferenceClip
from vnl_tpu.envs.base import PipelineEnv, State
from vnl_tpu.envs.registry import register_environment

_HUMANOID_XML = "/root/reference/assets/humanoid.xml"


def _load_humanoid_model(solver: str, iterations: int, ls_iterations: int,
                         dtype):
    return mjcf.load_model(
        _HUMANOID_XML,
        overrides={
            "solver": solver,
            "iterations": iterations,
            "ls_iterations": ls_iterations,
        },
        dtype=dtype,
    )


def _nan_guard(data, done):
    bad = jnp.logical_not(jnp.all(jnp.isfinite(data.qpos))
                          & jnp.all(jnp.isfinite(data.qvel))
                          & jnp.all(jnp.isfinite(data.qacc)))
    return jnp.where(bad, 1.0, done)


class HumanoidTracking(PipelineEnv):
    """Single-clip CMU-humanoid tracking (humanoid.py:25-466).

    Traj features (separate encoder pathway) use the full body list; reward
    terms/weights follow humanoid.py:196-311.  The reference clip must carry
    ``center_of_mass`` (legacy 13-field pipeline) or it is approximated by
    the root body position.
    """

    def __init__(
        self,
        reference_clip: Optional[ReferenceClip] = None,
        solver: str = "cg",
        iterations: int = 6,
        ls_iterations: int = 6,
        healthy_z_range: Tuple[float, float] = (1.0, 2.0),
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
        model = _load_humanoid_model(solver, iterations, ls_iterations, dtype)
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
            # synthetic standing clip from the "stand_on_left_leg" keyframe
            # (the reference's humanoid_traj_stand.p is not shipped)
            from vnl_tpu.data.preprocess import make_static_clip
            qpos = (model.key_qpos[1] if model.nkey > 1 else model.qpos0)
            reference_clip = make_static_clip(model, qpos, clip_length, dtype)
        self._ref_traj = reference_clip
        if self._episode_length > self._clip_length:
            raise ValueError("episode_length cannot be greater than clip_length!")

    def reset(self, rng: jax.Array) -> State:
        rng, subkey = jax.random.split(rng)
        start_frame = jax.random.randint(
            subkey, (), 0,
            self._clip_length - self._episode_length - self._ref_traj_length)
        return self.reset_to_frame(start_frame)

    def reset_to_frame(self, start_frame) -> State:
        ref = self._ref_traj
        qpos = jnp.concatenate([
            ref.position[start_frame], ref.quaternion[start_frame],
            ref.joints[start_frame]])
        qvel = jnp.concatenate([
            ref.velocity[start_frame], ref.angular_velocity[start_frame],
            ref.joints_velocity[start_frame]])
        data = self.pipeline_init(qpos, qvel)
        obs = self._get_obs(data)
        info = {"cur_frame": jnp.asarray(start_frame, jnp.int32),
                "traj": self._get_traj(data, start_frame)}
        reward, done, zero = jnp.zeros(3)
        metrics = {"rcom": zero, "rvel": zero, "rtrunk": zero, "rquat": zero,
                   "ract": zero, "termination_error": zero}
        state = State(data, obs, reward, done, metrics, info)
        info["termination_error"] = self._calculate_termination(state)
        return state.replace(info=info)

    def step(self, state: State, action: jax.Array) -> State:
        data = self.pipeline_step(state.pipeline_state, action)
        info = dict(state.info)
        info["cur_frame"] = info["cur_frame"] + 1
        obs = self._get_obs(data)
        traj = self._get_traj(data, info["cur_frame"])

        # Pair POST-step data with the incremented frame (rodent.py
        # convention; the reference pairs old-data/old-frame,
        # humanoid.py:190-244).  The pre-step state is NOT safe to read
        # spatial fields from: after an AutoReset restore only qpos/qvel/act
        # are live, and the stale xpos/subtree_com of the episode that just
        # died (possibly non-finite) leaked NaN into the rcom/rtrunk metrics
        # and garbage into the first reward of every restored episode.
        rcom, rvel, rtrunk, rquat, ract, is_healthy = self._calculate_reward(
            state.replace(pipeline_state=data, info=info), action)
        done = jnp.where(rtrunk < 0.5, 1.0, 0.0)
        rcom, rvel, rtrunk, rquat = (x * 0.01 for x in (rcom, rvel, rtrunk, rquat))
        ract = ract * 0.0001
        # Sanitize each term (not just the total): terms feed state.metrics,
        # and the EvalWrapper's masked sum (a + b * active) propagates a NaN
        # from a physics-blowup terminal step into the whole episode tally.
        rcom, rvel, rtrunk, rquat, ract = (
            jnp.nan_to_num(x, posinf=0.0, neginf=0.0)
            for x in (rcom, rvel, rtrunk, rquat, ract))
        total_reward = rcom + rvel + rtrunk + rquat + ract
        info["termination_error"] = rtrunk
        info["traj"] = traj
        done = jnp.maximum(done, 1.0 - is_healthy)
        # posinf/neginf=0: mapping a blown-up obs to +-3.4e38 instead would
        # permanently poison the running obs-normalizer statistics (the
        # round-3 humanoid run's v_loss exploded to 5e8 exactly this way).
        reward = jnp.nan_to_num(total_reward, posinf=0.0, neginf=0.0)
        obs = jnp.nan_to_num(obs, posinf=0.0, neginf=0.0)
        done = _nan_guard(data, done)
        state.metrics.update(rcom=rcom, rvel=rvel, rquat=rquat, ract=ract,
                             rtrunk=rtrunk, termination_error=rtrunk)
        return state.replace(pipeline_state=data, obs=obs, reward=reward,
                             done=done, info=info)

    def _calculate_termination(self, state):
        """Mean-abs joint+body error (humanoid.py:244-262, mean not L1-sum)."""
        data = state.pipeline_state
        frame = state.info["cur_frame"]
        ref = self._ref_traj
        error_joints = jnp.mean(jnp.abs(ref.joints[frame] - data.qpos[7:]))
        error_bodies = jnp.mean(jnp.abs(
            ref.body_positions[frame] - data.xpos))
        error = (0.5 * self._body_error_multiplier * error_bodies
                 + 0.5 * error_joints)
        return 1.0 - error / self._termination_threshold

    def _ref_com(self, frame):
        ref = self._ref_traj
        if ref.center_of_mass is not None:
            return ref.center_of_mass[frame]
        return ref.position[frame]

    def _calculate_reward(self, state, action):
        data = state.pipeline_state
        frame = state.info["cur_frame"]
        ref = self._ref_traj
        rcom = jnp.exp(-100.0 * jnp.linalg.norm(
            data.subtree_com[1] - self._ref_com(frame)))
        qvel_ref = jnp.concatenate([
            ref.velocity[frame], ref.angular_velocity[frame],
            ref.joints_velocity[frame]])
        rvel = jnp.exp(-0.1 * jnp.linalg.norm(data.qvel - qvel_ref))
        rtrunk = self._calculate_termination(state)
        rquat = jnp.exp(-2.0 * jnp.linalg.norm(
            vmath.bounded_quat_dist(data.qpos[3:7], ref.quaternion[frame])))
        ract = -0.015 * jnp.mean(jnp.square(data.qfrc_actuator))
        z = data.qpos[2]
        is_healthy = jnp.where(z < self._healthy_z_range[0], 0.0, 1.0)
        is_healthy = jnp.where(z > self._healthy_z_range[1], 0.0, is_healthy)
        return rcom, rvel, rtrunk, rquat, ract, is_healthy

    def _get_obs(self, data) -> jax.Array:
        """qpos + qvel (humanoid.py:354-370)."""
        return jnp.concatenate([data.qpos, data.qvel])

    def _get_traj(self, data, cur_frame) -> jax.Array:
        """4-block traj features over the next window (humanoid.py:313-352):
        full-body rel pos local/global + rel root local + rel joints."""
        window = self._ref_traj.slice(cur_frame + 1, self._ref_traj_length)
        xmat_root = data.xmat[1]
        diff_bodies = window.body_positions - data.xpos[None]
        rel_local = (diff_bodies @ xmat_root).ravel()
        rel_global = diff_bodies.ravel()
        rel_root = ((window.position - data.qpos[:3]) @ xmat_root).ravel()
        rel_joints = (window.joints - data.qpos[7:]).ravel()
        return jnp.concatenate([rel_local, rel_global, rel_root, rel_joints])


class HumanoidStanding(PipelineEnv):
    """Classic standing/locomotion task (humanoid.py:469-607)."""

    def __init__(
        self,
        solver: str = "cg",
        iterations: int = 6,
        ls_iterations: int = 6,
        forward_reward_weight: float = 0.0,
        ctrl_cost_weight: float = 0.1,
        healthy_reward: float = 5.0,
        terminate_when_unhealthy: bool = True,
        healthy_z_range: Tuple[float, float] = (1.0, 2.0),
        reset_noise_scale: float = 1e-2,
        exclude_current_positions_from_observation: bool = True,
        physics_steps_per_control_step: int = 5,
        dtype=jnp.float32,
        **kwargs,
    ):
        model = _load_humanoid_model(solver, iterations, ls_iterations, dtype)
        super().__init__(model, n_frames=kwargs.get(
            "n_frames", physics_steps_per_control_step))
        self._forward_reward_weight = forward_reward_weight
        self._ctrl_cost_weight = ctrl_cost_weight
        self._healthy_reward = healthy_reward
        self._terminate_when_unhealthy = terminate_when_unhealthy
        self._healthy_z_range = healthy_z_range
        self._reset_noise_scale = reset_noise_scale
        self._exclude_pos = exclude_current_positions_from_observation

    def reset(self, rng: jax.Array) -> State:
        rng, rng1, rng2 = jax.random.split(rng, 3)
        low, hi = -self._reset_noise_scale, self._reset_noise_scale
        qpos = self.sys.qpos0 + jax.random.uniform(
            rng1, (self.sys.nq,), minval=low, maxval=hi)
        qvel = jax.random.uniform(rng2, (self.sys.nv,), minval=low, maxval=hi)
        data = self.pipeline_init(qpos, qvel)
        obs = self._get_obs(data, jnp.zeros(self.sys.nu))
        reward, done, zero = jnp.zeros(3)
        metrics = {
            "forward_reward": zero, "reward_linvel": zero,
            "reward_quadctrl": zero, "reward_alive": zero,
            "x_position": zero, "y_position": zero,
            "distance_from_origin": zero, "x_velocity": zero,
            "y_velocity": zero,
        }
        # "traj" pathway mirrors obs so the shared intention-PPO stack also
        # trains this vanilla locomotion task (BASELINE config #2).  The COM
        # is carried in info (restored by AutoResetWrapper's info snapshot):
        # the previous pipeline_state's subtree_com is STALE after an
        # AutoReset restore (only qpos/qvel/act are swapped), so reading it
        # directly would produce a garbage COM velocity on the first step of
        # every restored episode.
        info = {"traj": obs, "com": data.subtree_com[1]}
        return State(data, obs, reward, done, metrics, info)

    def step(self, state: State, action: jax.Array) -> State:
        data0 = state.pipeline_state
        data = self.pipeline_step(data0, action)
        com_before = state.info["com"]
        com_after = data.subtree_com[1]
        velocity = (com_after - com_before) / self.dt
        forward_reward = self._forward_reward_weight * velocity[0]

        min_z, max_z = self._healthy_z_range
        is_healthy = jnp.where(data.qpos[2] < min_z, 0.0, 1.0)
        is_healthy = jnp.where(data.qpos[2] > max_z, 0.0, is_healthy)
        healthy_reward = (self._healthy_reward if self._terminate_when_unhealthy
                          else self._healthy_reward * is_healthy)
        ctrl_cost = self._ctrl_cost_weight * jnp.sum(jnp.square(action))
        obs = self._get_obs(data, action)
        reward = forward_reward + healthy_reward - ctrl_cost
        done = 1.0 - is_healthy if self._terminate_when_unhealthy else 0.0
        # posinf/neginf=0: +-3.4e38 would poison the obs-normalizer stats
        reward = jnp.nan_to_num(reward, posinf=0.0, neginf=0.0)
        obs = jnp.nan_to_num(obs, posinf=0.0, neginf=0.0)
        done = _nan_guard(data, done)
        state.metrics.update(
            forward_reward=forward_reward, reward_linvel=forward_reward,
            reward_quadctrl=-ctrl_cost, reward_alive=healthy_reward,
            x_position=com_after[0], y_position=com_after[1],
            distance_from_origin=jnp.linalg.norm(com_after),
            x_velocity=velocity[0], y_velocity=velocity[1])
        info = dict(state.info)
        info["traj"] = obs
        info["com"] = com_after
        return state.replace(pipeline_state=data, obs=obs, reward=reward,
                             done=done, info=info)

    def _cinert10(self, data) -> jax.Array:
        """Packs the 6x6 com-frame inertias into MuJoCo's 10-float format
        [A00,A11,A22,A01,A02,A12, h, m] for obs parity (humanoid.py:603)."""
        c = data.cinert
        A = c[:, :3, :3]
        h = c[:, :3, 3:]
        m = c[:, 3, 3]
        hvec = jnp.stack([h[:, 2, 1], h[:, 0, 2], h[:, 1, 0]], axis=-1)
        return jnp.concatenate([
            A[:, 0, 0:1], A[:, 1, 1:2], A[:, 2, 2:3],
            A[:, 0, 1:2], A[:, 0, 2:3], A[:, 1, 2:3],
            hvec, m[:, None]], axis=-1)

    def _get_obs(self, data, action) -> jax.Array:
        """qpos(+strip xy) + qvel + cinert + cvel + qfrc_actuator
        (humanoid.py:592-607)."""
        position = data.qpos
        if self._exclude_pos:
            position = position[2:]
        return jnp.concatenate([
            position, data.qvel,
            self._cinert10(data)[1:].ravel(),
            data.cvel[1:].ravel(),
            data.qfrc_actuator,
        ])


register_environment("humanoidtracking", lambda **kw: HumanoidTracking(**kw))
register_environment("humanoidstanding", lambda **kw: HumanoidStanding(**kw))
