"""Golden-trajectory regression tests (SURVEY.md §4 test strategy).

A fixed-seed random-action ant rollout recorded at a known-good revision;
any physics/compiler change that shifts trajectories shows up here before
it silently changes training behaviour.  Regenerate deliberately with
tools/regen_golden.py after an *intentional* physics change.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vnl_tpu import envs

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "golden_ant_rollout.npz")
RODENT_FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                              "golden_rodent_rollout.npz")


def _rollout(n=30):
    env = envs.get_environment("ant")
    rng = jax.random.PRNGKey(0)
    state = jax.jit(env.reset)(rng)
    step = jax.jit(env.step)
    qs, rs = [], []
    for _ in range(n):
        rng, k = jax.random.split(rng)
        a = 0.3 * jax.random.normal(k, (env.action_size,))
        state = step(state, a)
        qs.append(np.asarray(state.pipeline_state.qpos))
        rs.append(float(state.reward))
    return np.stack(qs), np.asarray(rs)


@pytest.mark.skipif(not os.path.exists(FIXTURE), reason="fixture missing")
def test_golden_ant_rollout():
    want = np.load(FIXTURE)
    qpos, reward = _rollout(want["qpos"].shape[0])
    np.testing.assert_allclose(qpos, want["qpos"], atol=1e-5)
    np.testing.assert_allclose(reward, want["reward"], atol=1e-5)


def _rodent_rollout(n=20):
    """Fixed-seed FLAGSHIP rollout: rodent tracking env (contact set, clip
    featurization, reward terms) — a rodent-specific regression in any of
    those shifts this trajectory (VERDICT r3: the ant golden alone could
    not trip them)."""
    import yaml

    from vnl_tpu.data.io import load_clip

    cfg = yaml.safe_load(
        open("/root/repo/configs/env_config.yaml"))["env"]
    clip = load_clip(cfg["clip_path"])
    env = envs.get_environment("rodent", reference_clip=clip,
                               **cfg["env_args"])
    rng = jax.random.PRNGKey(0)
    state = jax.jit(env.reset)(rng)
    step = jax.jit(env.step)
    qs, rs, obs = [], [], []
    for _ in range(n):
        rng, k = jax.random.split(rng)
        a = 0.2 * jax.random.normal(k, (env.action_size,))
        state = step(state, a)
        qs.append(np.asarray(state.pipeline_state.qpos))
        rs.append(float(state.reward))
        obs.append(np.asarray(state.obs))
    return np.stack(qs), np.asarray(rs), np.stack(obs)


@pytest.mark.skipif(not os.path.exists(RODENT_FIXTURE),
                    reason="fixture missing")
def test_golden_rodent_rollout():
    """CPU-vs-fixture: exact within float tolerance."""
    want = np.load(RODENT_FIXTURE)
    qpos, reward, obs = _rodent_rollout(want["qpos"].shape[0])
    np.testing.assert_allclose(qpos, want["qpos"], atol=1e-5)
    np.testing.assert_allclose(reward, want["reward"], atol=1e-5)
    np.testing.assert_allclose(obs, want["obs"], atol=1e-4)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="needs real TPU (set VNL_TPU_TEST_BACKEND=tpu)")
def test_golden_rodent_rollout_tpu():
    """TPU-vs-CPU-fixture.  Contact dynamics are chaotic (1-ulp matmul
    differences double every few steps — measured full-horizon qpos drift
    1.2e-2 with reward drift only 1e-4), so the stated tolerances are:
    tight state equality over the first 5 steps (where a systematic
    numeric bug would show) and behavioral (reward-stream) equality over
    the whole horizon.  See tools/check_tpu_numerics.py."""
    want = np.load(RODENT_FIXTURE)
    qpos, reward, obs = _rodent_rollout(want["qpos"].shape[0])
    np.testing.assert_allclose(qpos[:5], want["qpos"][:5], atol=5e-4)
    np.testing.assert_allclose(reward, want["reward"], atol=1e-2)
