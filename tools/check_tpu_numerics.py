"""TPU-vs-CPU numerics check for the flagship rodent path (VERDICT r3 #6).

Two checks, run on real TPU hardware (the fused Pallas kernels only execute
for real there — the CPU suite runs them in interpret mode):

1. fixture drift: the fixed-seed 20-step rodent rollout vs the CPU-recorded
   golden fixture (tests/fixtures/golden_rodent_rollout.npz).  Single-env,
   so this exercises the XLA physics path + TPU matmul precision pins.
2. fused-vs-XLA on device: one batched (B=128) forward with the Pallas
   position+CG megakernels ON vs OFF, compared directly on the TPU.

Prints max abs differences and PASS/FAIL against the stated tolerances
(the same ones tests/test_golden.py::test_golden_rodent_rollout_tpu uses).

Usage: python tools/check_tpu_numerics.py
"""

import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def check_fixture():
    """TPU-vs-CPU drift on the fixed-seed rodent rollout.

    Contact dynamics are chaotic: a 1-ulp matmul difference doubles every
    few steps, so full-horizon state equality is not a meaningful check.
    PASS criteria: (a) EARLY steps (first 5) match tightly — this is where
    a systematic numeric bug (wrong kernel math, precision regression)
    shows up before chaos does; (b) the REWARD stream stays behaviorally
    equal over the whole horizon."""
    from tests.test_golden import RODENT_FIXTURE, _rodent_rollout

    want = np.load(RODENT_FIXTURE)
    qpos, reward, obs = _rodent_rollout(want["qpos"].shape[0])
    per_step = np.abs(qpos - want["qpos"]).max(axis=1)
    dr = np.abs(reward - want["reward"]).max()
    print("per-step max|dqpos|: "
          + " ".join(f"{d:.1e}" for d in per_step), flush=True)
    early = per_step[:5].max()
    ok = early < 5e-4 and dr < 1e-2
    print(f"fixture drift: early(5)|dqpos|={early:.2e} (tol 5e-4) "
          f"max|dreward|={dr:.2e} (tol 1e-2) "
          f"full-horizon |dqpos|={per_step.max():.2e} (chaotic, informative"
          f" only)  {'PASS' if ok else 'FAIL'}", flush=True)
    return ok


def check_fused_vs_xla(B=128):
    from vnl_tpu import mjcf, physics

    m = mjcf.load_model("/root/reference/assets/rodent.xml",
                        rescale=(0.9, 0.9), torque_actuators=True,
                        overrides={"solver": "cg", "iterations": 6,
                                   "ls_iterations": 6})
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    qpos = jnp.tile(m.qpos0[None], (B, 1)).at[:, 2].add(-0.005)
    qpos = qpos.at[:, 7:].add(0.05 * jax.random.normal(k1, (B, m.nq - 7)))
    qvel = 0.3 * jax.random.normal(k2, (B, m.nv))

    outs = {}
    for mode in ("0", "1"):
        os.environ["VNL_TPU_FUSED_POSITION"] = mode
        os.environ["VNL_TPU_FUSED_CG"] = mode

        # a FRESH function per mode: the enabled() flags are read at trace
        # time, and jax caches jitted executables by function identity —
        # reusing one `fwd` would silently compare a path against itself
        def fwd(q, v, _mode=mode):
            d = jax.vmap(lambda q, v: physics.make_data(m, qpos=q,
                                                        qvel=v))(q, v)
            d = jax.vmap(lambda d: physics.forward(m, d))(d)
            return d.qacc, d.qfrc_constraint

        outs[mode] = jax.device_get(jax.jit(fwd)(qpos, qvel))
    dq = np.abs(outs["0"][0] - outs["1"][0]).max()
    df = np.abs(outs["0"][1] - outs["1"][1]).max()
    scale = np.abs(outs["0"][0]).max()
    ok = dq < 5e-2 * max(scale, 1.0)
    print(f"fused-vs-XLA on TPU: max|dqacc|={dq:.2e} (qacc scale {scale:.1f})"
          f" max|dqfrc|={df:.2e}  {'PASS' if ok else 'FAIL'}", flush=True)
    return ok


def main():
    if jax.default_backend() != "tpu":
        print("not on TPU (backend=%s); nothing to check"
              % jax.default_backend(), flush=True)
        return 0
    ok = check_fixture()
    ok = check_fused_vs_xla() and ok
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
