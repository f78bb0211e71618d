"""Benchmark: rodent-imitation env stepping throughput on real hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The metric is aggregate env-steps/s for the flagship workload (rodent
tracking env: 5 physics substeps + tracking reward + 795-dim reference
features per control step), batched with vmap on the available device(s).

vs_baseline is the fraction of the per-chip share of the north-star target
(>=1M env-steps/s aggregate at 8 chips => 125k/chip; BASELINE.json — the
reference publishes no numbers of its own).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

PER_CHIP_TARGET = 125_000.0


def _run():
    from vnl_tpu import envs
    from vnl_tpu.data.io import load_clip
    from vnl_tpu.utils import load_config

    cfg = load_config("configs/env_config.yaml")["env"]
    clip = load_clip(cfg["clip_path"])
    env = envs.get_environment("rodent", reference_clip=clip,
                               **cfg["env_args"])

    n_dev = len(jax.devices())
    batch = 1024 * n_dev
    n_steps = 20

    rng = jax.random.PRNGKey(0)
    reset_keys = jax.random.split(rng, batch)
    state = jax.jit(jax.vmap(env.reset))(reset_keys)

    def rollout(state, key):
        def body(carry, _):
            state, key = carry
            key, sub = jax.random.split(key)
            actions = 0.3 * jax.random.normal(
                sub, (batch, env.action_size), state.obs.dtype)
            state = jax.vmap(env.step)(state, actions)
            return (state, key), ()

        (state, _), _ = jax.lax.scan(body, (state, key), (), length=n_steps)
        return state

    rollout = jax.jit(rollout, donate_argnums=(0,))

    # compile + warmup. Two calls: the second input reuses rollout-produced
    # buffer layouts (donation), which triggers one extra compile.
    state = rollout(state, rng)
    state.reward.block_until_ready()
    state = rollout(state, rng)
    state.reward.block_until_ready()

    t0 = time.perf_counter()
    iters = 5
    for i in range(iters):
        state = rollout(state, jax.random.fold_in(rng, i))
    state.reward.block_until_ready()
    dt = time.perf_counter() - t0

    steps = batch * n_steps * iters
    sps = steps / dt
    print(json.dumps({
        "metric": "rodent_imitation_env_steps_per_s",
        "value": round(sps, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(sps / (PER_CHIP_TARGET * n_dev), 4),
    }))


def main():
    # one retry: the TPU relay in this environment occasionally faults with
    # UNAVAILABLE on programs that run fine moments later
    try:
        _run()
    except Exception as first_err:
        import traceback
        traceback.print_exc()
        try:
            _run()
        except Exception:
            traceback.print_exc()
            print(json.dumps({
                "metric": "rodent_imitation_env_steps_per_s",
                "value": 0.0,
                "unit": "env-steps/s",
                "vs_baseline": 0.0,
                "error": f"{type(first_err).__name__}: TPU run failed twice; "
                         "last recorded healthy run: 21058 env-steps/s",
            }))


if __name__ == "__main__":
    main()
