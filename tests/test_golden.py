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
