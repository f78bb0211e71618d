"""Explore the rodent tracking env: jit rollout + termination-error curve.

Script equivalent of the reference's environments_rodent.ipynb /
notebooks/test_rodent.ipynb workflow (SURVEY.md §4): construct
RodentTracking, run a random-action rollout (sigma=0.3), record the
termination_error trajectory as a smooth-divergence sanity check, and
optionally render an overlay video.

  python examples/rollout_rodent.py [--render] [--plot]
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from vnl_tpu import envs
from vnl_tpu.data.io import load_clip


def main(render: bool = False, plot: bool = False):
    cfg = yaml.safe_load(open("configs/env_config.yaml"))["env"]
    clip = load_clip(cfg["clip_path"])
    env = envs.get_environment("rodent", reference_clip=clip,
                               **cfg["env_args"])

    rng = jax.random.PRNGKey(0)
    state = jax.jit(env.reset)(rng)
    step = jax.jit(env.step)
    print(f"obs={state.obs.shape} traj={state.info['traj'].shape} "
          f"init termination_error="
          f"{float(state.info['termination_error']):.4f}")

    qpos_traj, term_err = [], []
    for t in range(50):
        rng, key = jax.random.split(rng)
        action = 0.3 * jax.random.normal(key, (env.action_size,))
        state = step(state, action)
        qpos_traj.append(np.asarray(state.pipeline_state.qpos))
        term_err.append(float(state.metrics["termination_error"]))
        if t % 10 == 9:
            print(f"t={t+1:3d} reward={float(state.reward):.5f} "
                  f"rtrunk={term_err[-1]:.4f} done={float(state.done):.0f}")

    print("termination_error curve (should diverge smoothly):")
    print(np.array2string(np.asarray(term_err[:20]), precision=3))

    if plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(6, 3.5))
        ax.plot(term_err)
        ax.axhline(1.0, ls="--", lw=1, label="done threshold (rtrunk<0)")
        ax.set_xlabel("step")
        ax.set_ylabel("termination error")
        ax.set_title("random-action rollout divergence (sigma=0.3)")
        ax.legend()
        fig.tight_layout()
        fig.savefig("/tmp/rodent_termination_error.png", dpi=120)
        print("wrote /tmp/rodent_termination_error.png")

    if render:
        from vnl_tpu.render import render_overlay_video
        ref = env._ref_traj
        T = len(qpos_traj)
        qref = np.concatenate([
            np.asarray(ref.position)[:T], np.asarray(ref.quaternion)[:T],
            np.asarray(ref.joints)[:T]], axis=1)
        out = render_overlay_video(env.sys, np.stack(qpos_traj), qref,
                                   "/tmp/rodent_rollout.mp4")
        print("wrote", out)


if __name__ == "__main__":
    main(render="--render" in sys.argv, plot="--plot" in sys.argv)
