"""Environment framework tests (ant fast path + rodent structure)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from vnl_tpu import envs
from vnl_tpu.data.io import load_clip

CLIP = "/root/reference/clips/transform_snips_groom.p"
ENV_CFG = "/root/repo/configs/env_config.yaml"


@pytest.fixture(scope="module")
def ant_env():
    return envs.get_environment("ant")


def test_ant_rollout_deterministic(ant_env):
    """Fixed seed => bit-identical trajectories (BASELINE config #1)."""
    env = ant_env
    step = jax.jit(env.step)

    def rollout():
        rng = jax.random.PRNGKey(0)
        state = jax.jit(env.reset)(rng)
        rewards = []
        for i in range(20):
            rng, k = jax.random.split(rng)
            a = 0.3 * jax.random.normal(k, (env.action_size,))
            state = step(state, a)
            rewards.append(float(state.reward))
        return np.asarray(rewards), np.asarray(state.pipeline_state.qpos)

    r1, q1 = rollout()
    r2, q2 = rollout()
    np.testing.assert_array_equal(r1, r2)
    np.testing.assert_array_equal(q1, q2)
    assert np.all(np.isfinite(q1))


def test_episode_wrapper_truncation(ant_env):
    env = envs.EpisodeWrapper(ant_env, episode_length=5)
    state = jax.jit(env.reset)(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    for i in range(5):
        state = step(state, jnp.zeros(env.action_size))
    assert float(state.done) == 1.0
    assert float(state.info["truncation"]) == 1.0  # time-limit, not failure


def test_auto_reset_restores_state(ant_env):
    env = envs.wrap_for_training(ant_env, episode_length=3)
    rng = jax.random.split(jax.random.PRNGKey(0), 4)
    state = jax.jit(env.reset)(rng)
    first_qpos = np.asarray(state.pipeline_state.qpos)
    step = jax.jit(env.step)
    for i in range(3):
        state = step(state, jnp.zeros((4, env.action_size)))
    assert np.all(np.asarray(state.done) == 1.0)
    state = step(state, jnp.zeros((4, env.action_size)))
    # restored to initial pipeline state (then stepped once)
    assert np.allclose(np.asarray(state.info["steps"]), 1.0)
    # info bookkeeping also restored (our fix over brax semantics)
    assert np.all(np.asarray(state.info["cur_frame"]) <= 1)


def test_vmap_wrapper_batches(ant_env):
    env = envs.VmapWrapper(ant_env, batch_size=6)
    state = jax.jit(env.reset)(jax.random.PRNGKey(1))
    assert state.obs.shape[0] == 6
    nstate = jax.jit(env.step)(state, jnp.zeros((6, env.action_size)))
    assert nstate.reward.shape == (6,)


@pytest.fixture(scope="module")
def rodent_env():
    cfg = yaml.safe_load(open(ENV_CFG))["env"]
    clip = load_clip(CLIP)
    return envs.get_environment("rodent", reference_clip=clip,
                                **cfg["env_args"])


def test_rodent_obs_and_traj_sizes(rodent_env):
    """Parity with reference dims: obs 232, traj 795 (SURVEY.md §2.1)."""
    state = jax.jit(rodent_env.reset)(jax.random.PRNGKey(0))
    assert state.obs.shape == (232,)
    assert state.info["traj"].shape == (795,)
    # starts near the reference: termination_error ~ 1
    assert float(state.info["termination_error"]) > 0.9


def test_rodent_step_and_reward_terms(rodent_env):
    state = jax.jit(rodent_env.reset)(jax.random.PRNGKey(0))
    step = jax.jit(rodent_env.step)
    state = step(state, jnp.zeros(rodent_env.action_size))
    for k in ("rcom", "rvel", "rtrunk", "rquat", "ract", "rapp"):
        assert k in state.metrics
        assert np.isfinite(float(state.metrics[k]))
    assert np.all(np.isfinite(np.asarray(state.obs)))
    # near the reference at t=1, reward terms should be positive-ish
    assert float(state.metrics["rcom"]) > 0.0


def test_rodent_sub_clip_termination(rodent_env):
    state = jax.jit(rodent_env.reset)(jax.random.PRNGKey(3))
    step = jax.jit(rodent_env.step)
    sub = rodent_env._sub_clip_length
    for i in range(sub):
        state = step(state, jnp.zeros(rodent_env.action_size))
    assert float(state.done) == 1.0  # sub-clip elapsed forces done


def test_rodent_sub_clip_curriculum():
    """min_sub_clip_length samples per-episode horizons log-uniformly in
    [min, sub_clip_length] and the sampled horizon (not the static max)
    forces done."""
    cfg = yaml.safe_load(open(ENV_CFG))["env"]
    clip = load_clip(CLIP)
    env = envs.get_environment(
        "rodent", reference_clip=clip,
        **{**cfg["env_args"], "sub_clip_length": 200,
           "min_sub_clip_length": 5})
    states = jax.jit(jax.vmap(env.reset))(
        jax.random.split(jax.random.PRNGKey(0), 64))
    lens = np.asarray(states.info["sub_clip_length"])
    assert lens.min() >= 5 and lens.max() <= 200
    assert len(np.unique(lens)) > 10  # a real mixture, not a constant
    # start frames always leave room for the sampled horizon + lookahead
    starts = np.asarray(states.info["cur_frame"])
    assert np.all(starts + lens + env._ref_traj_length
                  <= env._clip_length)
    # the sampled horizon forces done: run one short-horizon env
    i = int(np.argmin(lens))
    state = jax.tree_util.tree_map(lambda x: x[i], states)
    step = jax.jit(env.step)
    for _ in range(int(lens[i])):
        state = step(state, jnp.zeros(env.action_size))
    assert float(state.done) == 1.0


def test_multiclip_env():
    cfg = yaml.safe_load(open(ENV_CFG))["env"]
    clip = load_clip(CLIP)
    from vnl_tpu.data.reference_clip import ClipLibrary
    lib = ClipLibrary.from_clips([clip, clip])
    env = envs.get_environment("rodent_multiclip", clip_library=lib,
                               **cfg["env_args"])
    state = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert "clip_id" in state.info
    state = jax.jit(env.step)(state, jnp.zeros(env.action_size))
    assert np.isfinite(float(state.reward))


def test_humanoid_tracking_default_clip():
    """HumanoidTracking runs end-to-end on the synthetic standing clip
    (BASELINE config #3 analogue; the reference clip pickle is not
    shipped)."""
    env = envs.get_environment("humanoidtracking")
    state = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert float(state.info["termination_error"]) > 0.9
    step = jax.jit(env.step)
    state = step(state, jnp.zeros(env.action_size))
    for k in ("rcom", "rvel", "rtrunk", "rquat", "ract"):
        assert np.isfinite(float(state.metrics[k]))
    # traj features: 2*(nbody*3) + 3 + njoints per window frame
    m = env.sys
    want = 5 * (2 * m.nbody * 3 + 3 + (m.nq - 7))
    assert state.info["traj"].shape == (want,)


def test_humanoid_standing():
    env = envs.get_environment("humanoidstanding")
    state = jax.jit(env.reset)(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    state = step(state, jnp.zeros(env.action_size))
    assert np.isfinite(float(state.reward))
    # obs: qpos-2 + qvel + 16*10 cinert + 16*6 cvel + nu
    m = env.sys
    want = (m.nq - 2) + m.nv + (m.nbody - 1) * 10 + (m.nbody - 1) * 6 + m.nv
    assert state.obs.shape == (want,)


@pytest.mark.parametrize("name", ["humanoidtracking", "humanoidstanding"])
def test_humanoid_restore_boundary_sane(name):
    """Regression: the first step after an AutoReset restore must not read
    stale spatial fields (xpos/subtree_com) of the episode that just died —
    only qpos/qvel/act are swapped by the restore.  Guards the post-step
    reward pairing in HumanoidTracking (humanoid.py step) and the
    info-carried COM baseline in HumanoidStanding."""
    env = envs.wrap_for_training(
        envs.get_environment(name), episode_length=3)
    n = 4
    rng = jax.random.split(jax.random.PRNGKey(0), n)
    state = jax.jit(env.reset)(rng)
    step = jax.jit(env.step)
    # drive with large random actions so the pre-restore episode's spatial
    # state diverges hard from the reset snapshot
    akey = jax.random.PRNGKey(1)
    for i in range(3):
        akey, sub = jax.random.split(akey)
        a = jax.random.uniform(sub, (n, env.action_size), minval=-1.0,
                               maxval=1.0)
        state = step(state, a)
    assert np.all(np.asarray(state.done) == 1.0)  # truncated
    state = step(state, jnp.zeros((n, env.action_size)))  # restored step
    assert np.all(np.asarray(state.info["steps"]) == 1.0)
    assert np.all(np.isfinite(np.asarray(state.reward)))
    assert np.all(np.abs(np.asarray(state.reward)) < 100.0)
    for k, v in state.metrics.items():
        arr = np.asarray(v)
        assert np.all(np.isfinite(arr)), k
        assert np.all(np.abs(arr) < 1e3), (k, arr)
