"""Regenerates tests/fixtures after an intentional physics change."""

import os

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    import sys
    sys.path.insert(0, HERE)
    from tests.test_golden import _rodent_rollout, _rollout
    fixdir = os.path.join(HERE, "tests", "fixtures")
    os.makedirs(fixdir, exist_ok=True)

    qpos, reward = _rollout()
    out = os.path.join(fixdir, "golden_ant_rollout.npz")
    np.savez(out, qpos=qpos, reward=reward)
    print("wrote", out, qpos.shape)

    qpos, reward, obs = _rodent_rollout()
    out = os.path.join(fixdir, "golden_rodent_rollout.npz")
    np.savez(out, qpos=qpos, reward=reward, obs=obs)
    print("wrote", out, qpos.shape)


if __name__ == "__main__":
    main()
