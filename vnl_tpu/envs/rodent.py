"""Rodent mocap-tracking environments.

Re-implements /root/reference/envs/rodent.py (RodentTracking) on the
first-party engine, plus a real multi-clip variant (the reference's
RodentMultiClipTracking at rodent.py:473-475 is an empty stub).

Index-space semantics (SURVEY.md §2.5 quirks, resolved deliberately):
the reference indexes the 18-body-filtered reference clip with full-model
body ids (envs/rodent.py:279-281,308-310,446-448), which silently clamps
under jit, and indexes the 67-wide hinge joint array with mj joint ids that
count the free joint (envs/rodent.py:441).  Here every named feature is
resolved at env-build time into the correct index space:

- data.xpos lookups use full-model body ids;
- reference-clip body lookups use columns of the walker_body_names axis
  (the shipped clips' body axis ordering), with the appendage aliases
  hand_L/hand_R mapping to finger_L/finger_R, which are the hand bodies
  present in the tracked-body set;
- joint feature lookups use hinge-order indices (qposadr - 7).
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vnl_tpu import math as vmath
from vnl_tpu import mjcf
from vnl_tpu.data.reference_clip import ClipLibrary, ReferenceClip
from vnl_tpu.envs.base import PipelineEnv, State
from vnl_tpu.envs.registry import register_environment

_REF_BODY_ALIASES = {"hand_L": "finger_L", "hand_R": "finger_R"}


class RodentTracking(PipelineEnv):
    """Single-clip rodent imitation env (74-dof virtual rodent).

    Reward terms, weights and termination conditions follow
    /root/reference/envs/rodent.py:178-316.
    """

    def __init__(
        self,
        reference_clip: ReferenceClip,
        end_eff_names: List[str],
        appendage_names: List[str],
        walker_body_names: List[str],
        joint_names: List[str],
        center_of_mass: str,
        mjcf_path: str = "/root/reference/assets/rodent.xml",
        scale_factor: float = 0.9,
        solver: str = "cg",
        iterations: int = 6,
        ls_iterations: int = 6,
        healthy_z_range=(0.05, 0.5),
        reset_noise_scale: float = 1e-3,
        clip_length: int = 250,
        sub_clip_length: int = 10,
        min_sub_clip_length: Optional[int] = None,
        ref_traj_length: int = 5,
        termination_threshold: float = 5.0,
        body_error_multiplier: float = 1.0,
        physics_steps_per_control_step: int = 5,
        dtype=jnp.float32,
        **kwargs,
    ):
        model = mjcf.load_model(
            mjcf_path,
            rescale=(scale_factor, scale_factor),
            torque_actuators=True,
            overrides={
                "solver": solver,
                "iterations": iterations,
                "ls_iterations": ls_iterations,
                "cone": "pyramidal",
            },
            dtype=dtype,
        )
        super().__init__(model, n_frames=kwargs.get(
            "n_frames", physics_steps_per_control_step))

        b2id = {n: i for i, n in enumerate(model.body_names)}
        self._endeff_idxs = np.array([b2id[n] for n in end_eff_names])
        self._app_idxs = np.array([b2id[n] for n in appendage_names])
        self._com_idx = b2id[center_of_mass]
        self._body_idxs = np.array([b2id[n] for n in walker_body_names])

        ref_cols = {n: i for i, n in enumerate(walker_body_names)}
        self._ref_app_cols = np.array(
            [ref_cols[_REF_BODY_ALIASES.get(n, n)] for n in appendage_names])
        self._ref_com_col = ref_cols[center_of_mass]

        j2qposadr = {n: int(model.jnt_qposadr[model.joint_names.index(n)])
                     for n in joint_names}
        self._joint_cols = np.array([j2qposadr[n] - 7 for n in joint_names])

        self._healthy_z_range = healthy_z_range
        self._reset_noise_scale = reset_noise_scale
        self._termination_threshold = termination_threshold
        self._body_error_multiplier = body_error_multiplier
        self._clip_length = clip_length
        self._sub_clip_length = sub_clip_length
        self._min_sub_clip_length = min_sub_clip_length
        self._ref_traj_length = ref_traj_length
        if self._sub_clip_length > self._clip_length:
            raise ValueError("sub_clip_length cannot exceed clip_length!")
        if (min_sub_clip_length is not None
                and not 1 <= min_sub_clip_length <= sub_clip_length):
            raise ValueError("need 1 <= min_sub_clip_length <= "
                             "sub_clip_length")

        self._ref_clip = self._filter_clip(reference_clip, len(walker_body_names))

    def _filter_clip(self, clip: ReferenceClip, n_walker: int) -> ReferenceClip:
        """Ensures the clip's body axis is the walker_body_names axis and
        that all leaves are device arrays (host clips load as numpy)."""
        if clip is None:
            return None
        dtype = self.sys.qpos0.dtype
        clip = jax.tree_util.tree_map(
            lambda x: None if x is None else jnp.asarray(x, dtype), clip)
        nb = clip.body_positions.shape[1]
        if nb == n_walker:
            return clip
        if nb == self.sys.nbody:
            return clip.replace(
                body_positions=clip.body_positions[:, self._body_idxs],
                body_quaternions=(None if clip.body_quaternions is None else
                                  clip.body_quaternions[:, self._body_idxs]))
        raise ValueError(f"clip body axis {nb} matches neither walker "
                         f"({n_walker}) nor full model ({self.sys.nbody})")

    # ---- clip access (overridden by the multi-clip env) ----
    def _get_clip(self, info) -> ReferenceClip:
        return self._ref_clip

    def _extra_reset_info(self, rng, clip_weights=None) -> dict:
        return {}

    # ---- reset / step ----
    def reset(self, rng: jax.Array, clip_weights=None) -> State:
        rng_frame, rng_noise, rng_clip, rng_len = jax.random.split(rng, 4)
        # Sub-clip curriculum: when min_sub_clip_length is set, each episode
        # samples its own horizon log-uniformly in [min, sub_clip_length].
        # The reference trains only on fixed 10-step sub-clips
        # (env_config.yaml), which leaves full-clip eval rollouts
        # out-of-distribution (round-2 plateau diagnosis); mixing horizons
        # across the batch exposes the policy to long-horizon drift.
        if self._min_sub_clip_length is not None:
            lo = np.log(float(self._min_sub_clip_length))
            hi = np.log(float(self._sub_clip_length))
            u = jax.random.uniform(rng_len)
            sub_len = jnp.round(jnp.exp(lo + u * (hi - lo))).astype(jnp.int32)
        else:
            sub_len = jnp.asarray(self._sub_clip_length, jnp.int32)
        # Eval convention (reference train.py:95-104): passing
        # sub_clip_length = clip_length - ref_traj_length maxes the sub-clip
        # so the start-frame range collapses to {0} and episodes run whole
        # clips.
        frame_range = jnp.maximum(
            1, self._clip_length - sub_len - self._ref_traj_length)
        start_frame = jax.random.randint(rng_frame, (), 0, frame_range)
        info = {
            "cur_frame": start_frame,
            "sub_clip_frame": jnp.zeros((), jnp.int32),
            "sub_clip_length": sub_len,
        }
        info.update(self._extra_reset_info(rng_clip, clip_weights))
        ref = self._get_clip(info)

        noise = self._reset_noise_scale * jax.random.normal(
            rng_noise, (self.sys.nq,))
        qpos = jnp.concatenate([
            ref.position[start_frame],
            ref.quaternion[start_frame],
            ref.joints[start_frame],
        ])
        qvel = jnp.concatenate([
            ref.velocity[start_frame],
            ref.angular_velocity[start_frame],
            ref.joints_velocity[start_frame],
        ])
        data = self.pipeline_init(qpos + noise, qvel)
        info["traj"] = self._get_traj(data, start_frame, ref)

        obs = self._get_obs(data, jnp.zeros(self.sys.nu), info)
        reward, done, zero = jnp.zeros(3)
        metrics = {
            "rcom": zero, "rvel": zero, "rtrunk": zero, "rquat": zero,
            "ract": zero, "rapp": zero, "termination_error": zero,
        }
        state = State(data, obs, reward, done, metrics, info)
        info["termination_error"] = self._calculate_termination(state, ref)
        return state.replace(info=info)

    def step(self, state: State, action: jax.Array) -> State:
        data0 = state.pipeline_state
        data = self.pipeline_step(data0, action)

        info = dict(state.info)
        info["cur_frame"] = info["cur_frame"] + 1
        info["sub_clip_frame"] = info["sub_clip_frame"] + 1
        ref = self._get_clip(info)

        obs = self._get_obs(data, action, state.info)
        traj = self._get_traj(data, info["cur_frame"], ref)

        rcom, rvel, rtrunk, rquat, ract, rapp, is_healthy = (
            self._calculate_reward(state, data, ref, info))
        # weights per reference envs/rodent.py:193-201
        rcom = rcom * 0.01
        rvel = rvel * 0.01
        rapp = rapp * 0.01
        rtrunk = rtrunk * 0.01
        rquat = rquat * 0.01
        ract = ract * 0.0001

        info["termination_error"] = rtrunk
        info["traj"] = traj

        sub_clip_ok = info["sub_clip_frame"] < info["sub_clip_length"]
        done = jnp.where(rtrunk < 0, 1.0, 0.0)
        done = jnp.maximum(done, 1.0 - is_healthy)
        done = jnp.maximum(done, jnp.where(sub_clip_ok, 0.0, 1.0))

        # NaN containment (reference envs/rodent.py:217-225).  Each term is
        # sanitized (not just the total) because terms feed state.metrics and
        # the EvalWrapper's masked sums; posinf/neginf map to 0 rather than
        # +-3.4e38, which would permanently poison the running obs-normalizer
        # statistics (the round-3 humanoid v_loss blowup failure mode).
        rcom, rvel, rtrunk, rquat, ract, rapp = (
            jnp.nan_to_num(x, posinf=0.0, neginf=0.0)
            for x in (rcom, rvel, rtrunk, rquat, ract, rapp))
        total_reward = rcom + rvel + rtrunk + rquat + ract + rapp
        reward = jnp.nan_to_num(total_reward, posinf=0.0, neginf=0.0)
        obs = jnp.nan_to_num(obs, posinf=0.0, neginf=0.0)
        bad = jnp.logical_not(jnp.all(jnp.isfinite(data.qpos))
                              & jnp.all(jnp.isfinite(data.qvel))
                              & jnp.all(jnp.isfinite(data.qacc))
                              & jnp.all(jnp.isfinite(data.act)))
        done = jnp.where(bad, 1.0, done)

        state.metrics.update(
            rcom=rcom, rvel=rvel, rapp=rapp, rquat=rquat, rtrunk=rtrunk,
            ract=ract, termination_error=rtrunk)
        return state.replace(
            pipeline_state=data, obs=obs, reward=reward, done=done, info=info)

    # ---- reward / termination ----
    def _calculate_termination(self, state: State, ref: ReferenceClip):
        """1 - tracking_error/threshold (envs/rodent.py:241-264)."""
        data = state.pipeline_state
        frame = state.info["cur_frame"]
        target_joints = ref.joints[frame]
        error_joints = jnp.sum(jnp.abs(target_joints - data.qpos[7:]))
        target_bodies = ref.body_positions[frame]
        error_bodies = jnp.sum(jnp.abs(
            target_bodies - data.xpos[self._body_idxs]))
        error = (0.5 * self._body_error_multiplier * error_bodies
                 + 0.5 * error_joints)
        return 1.0 - error / self._termination_threshold

    def _calculate_reward(self, state: State, data, ref: ReferenceClip, info):
        """Six tracking reward terms (envs/rodent.py:266-316)."""
        frame = info["cur_frame"]
        com_c = data.subtree_com[1]
        com_ref = ref.body_positions[frame, self._ref_com_col]
        rcom = jnp.exp(-100.0 * jnp.linalg.norm(com_c - com_ref))

        qvel_ref = jnp.concatenate([
            ref.velocity[frame], ref.angular_velocity[frame],
            ref.joints_velocity[frame]])
        rvel = jnp.exp(-0.1 * jnp.linalg.norm(data.qvel - qvel_ref))

        # Pair the POST-step data with the incremented frame so rtrunk and
        # the termination condition are consistent with the other reward
        # terms (rcom/rvel/rquat/rapp all use new-data/new-frame). The
        # reference pairs old-data/old-frame (envs/rodent.py:241-264 called
        # from :190); we deliberately use the consistent pairing.
        rtrunk = self._calculate_termination(
            state.replace(pipeline_state=data, info=info), ref)

        quat_c = data.qpos[3:7]
        quat_ref = ref.quaternion[frame]
        rquat = jnp.exp(-2.0 * jnp.linalg.norm(
            vmath.bounded_quat_dist(quat_c, quat_ref)))

        ract = -0.015 * jnp.mean(jnp.square(data.qfrc_actuator))

        app_c = data.xpos[self._app_idxs].ravel()
        app_ref = ref.body_positions[frame, self._ref_app_cols].ravel()
        rapp = jnp.exp(-400.0 * jnp.linalg.norm(app_c - app_ref))

        z = data.qpos[2]
        is_healthy = jnp.where(z < self._healthy_z_range[0], 0.0, 1.0)
        is_healthy = jnp.where(z > self._healthy_z_range[1], 0.0, is_healthy)
        return rcom, rvel, rtrunk, rquat, ract, rapp, is_healthy

    # ---- observations ----
    def _get_obs(self, data, action, info) -> jax.Array:
        """Proprioceptive obs: qpos + qvel + qfrc_actuator + end effectors
        (envs/rodent.py:318-344)."""
        end_effectors = data.xpos[self._endeff_idxs].ravel()
        return jnp.concatenate([
            data.qpos, data.qvel, data.qfrc_actuator, end_effectors])

    def _get_traj(self, data, cur_frame, ref: ReferenceClip) -> jax.Array:
        """5-block reference-trajectory features over the upcoming window
        (envs/rodent.py:346-448): appendages (75) + rel body pos local (270)
        + rel body pos global (270) + rel root local (15) + rel joints (165)
        = 795 dims for the default config."""
        window = ref.slice(cur_frame + 1, self._ref_traj_length)

        xmat_root = data.xmat[1]

        def to_local(vec):
            return vec @ xmat_root

        ref_app = window.body_positions[:, self._ref_app_cols].ravel()

        xpos_walker = data.xpos[self._body_idxs]
        diff_bodies = window.body_positions - xpos_walker[None]
        rel_bodies_local = to_local(diff_bodies).ravel()
        rel_bodies_global = diff_bodies.ravel()

        diff_root = window.position - data.qpos[:3]
        rel_root_local = to_local(diff_root).ravel()

        rel_joints = (window.joints - data.qpos[7:])[:, self._joint_cols].ravel()

        return jnp.concatenate([
            ref_app, rel_bodies_local, rel_bodies_global, rel_root_local,
            rel_joints])


class RodentMultiClipTracking(RodentTracking):
    """Multi-clip rodent imitation: each episode samples a clip id from a
    device-resident ClipLibrary (completes the reference stub at
    envs/rodent.py:473-475 using the ClipCollection data model from
    mocap_preprocess.py:343-376)."""

    def __init__(self, clip_library: ClipLibrary, **kwargs):
        n_walker = len(kwargs["walker_body_names"])
        super().__init__(reference_clip=None, **kwargs)
        # filter each clip's body axis if needed
        clips = clip_library.clips
        if clips.body_positions.shape[2] == self.sys.nbody:
            clips = clips.replace(
                body_positions=clips.body_positions[:, :, self._body_idxs],
                body_quaternions=(None if clips.body_quaternions is None else
                                  clips.body_quaternions[:, :, self._body_idxs]))
        self._library = ClipLibrary(clips=clips, weights=clip_library.weights)

    def _extra_reset_info(self, rng, clip_weights=None) -> dict:
        # clip_weights (traced, (num_clips,)) overrides the library's static
        # weights — the trainer's adaptive sampler re-resets envs each eval
        # interval with weights grown on the clips the policy fails on
        # (completing the ClipCollection weighting design,
        # mocap_preprocess.py:343-376)
        if clip_weights is not None:
            cid = jax.random.categorical(rng, jnp.log(clip_weights))
            return {"clip_id": cid}
        return {"clip_id": self._library.sample_id(rng)}

    def _get_clip(self, info) -> ReferenceClip:
        return self._library.get(info["clip_id"])


def _make_rodent(**kwargs):
    return RodentTracking(**kwargs)


register_environment("rodent", _make_rodent)
register_environment("rodent_multiclip",
                     lambda **kw: RodentMultiClipTracking(**kw))
