"""Rollout-vs-SGD split of one training step (VERDICT #6).

Times, as separately-jitted programs at training shapes:
  (a) the rollout half: batch collection (scan of generate_unroll);
  (b) the SGD half: num_updates_per_batch x num_minibatches gradient
      updates on a fixed batch (shuffle included);
  (c) the combined training step for reference.

Usage: python tools/profile_training.py [num_envs]
(reference hyperparams: batch 32, unroll 20, 32 minibatches, 16 updates —
/root/reference/configs/train_config.yaml)
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from vnl_tpu import envs as envs_lib
from vnl_tpu import models as models_lib
from vnl_tpu.data.io import load_clip
from vnl_tpu.training import acting, gradients
from vnl_tpu.training import losses as ppo_losses
from vnl_tpu.training.losses import PPONetworkParams
from vnl_tpu.training import running_statistics
import optax

NUM_ENVS = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
BATCH, UNROLL, MINIB, UPDATES = 32, 20, 32, 16

cfg = yaml.safe_load(open("configs/env_config.yaml"))["env"]
clip = load_clip(cfg["clip_path"])
env = envs_lib.get_environment("rodent", reference_clip=clip,
                               **cfg["env_args"])
env = envs_lib.wrap_for_training(env, episode_length=150)

rng = jax.random.PRNGKey(0)
env_state = jax.jit(env.reset)(jax.random.split(rng, NUM_ENVS))
jax.block_until_ready(env_state)
print("env ready", flush=True)

network = models_lib.make_intention_ppo_networks(
    env_state.info["traj"].shape[-1], env_state.obs.shape[-1],
    env.action_size,
    preprocess_observations_fn=running_statistics.normalize)
make_policy = models_lib.make_inference_fn(network)

norm_params = running_statistics.init_state(env_state.obs.shape[-1])
pk, vk = jax.random.split(jax.random.PRNGKey(1))
params = PPONetworkParams(
    policy=network.policy_network.init(pk),
    value=network.value_network.init(vk))
optimizer = optax.adam(6e-4)
opt_state = optimizer.init(params)

loss_fn = functools.partial(
    ppo_losses.compute_ppo_intention_loss, ppo_network=network,
    entropy_cost=1e-3, discounting=0.99, reward_scaling=1.0,
    gae_lambda=0.95, clipping_epsilon=0.2, normalize_advantage=True,
    kl_weight=1e-4)
update_step = gradients.gradient_update_fn(
    loss_fn, optimizer, axis_name=None, has_aux=True)

rollouts_per_step = max(1, BATCH * MINIB // NUM_ENVS)


def collect(env_state, policy_params, rng):
    policy = make_policy(policy_params)

    def one_unroll(carry, _):
        state, k = carry
        uk, k = jax.random.split(k)
        state, chunk = acting.generate_unroll(
            env, state, policy, uk, UNROLL,
            extra_fields=("truncation", "traj"))
        return (state, k), chunk

    (env_state, _), batch = jax.lax.scan(
        one_unroll, (env_state, rng), (), length=rollouts_per_step)

    def flatten(x):
        x = jnp.swapaxes(x, 1, 2)
        return x.reshape((-1,) + x.shape[2:])

    return env_state, jax.tree_util.tree_map(flatten, batch)


import os
_SGD_UNROLL = int(os.environ.get("VNL_TPU_SGD_UNROLL", "1"))


def sgd(opt_state, params, batch, rng):
    def learn_on_batch(carry, _):
        opt_state, params, k = carry
        sk, gk, k = jax.random.split(k, 3)
        order = jax.random.permutation(sk, batch.observation.shape[0])
        minib = jax.tree_util.tree_map(
            lambda x: x[order].reshape((MINIB, -1) + x.shape[1:]), batch)

        def apply_mb(carry, mb):
            opt_state, params, k = carry
            k, lk = jax.random.split(k)
            (_, stats), params, opt_state = update_step(
                params, norm_params, mb, lk, optimizer_state=opt_state)
            return (opt_state, params, k), stats

        (opt_state, params, _), stats = jax.lax.scan(
            apply_mb, (opt_state, params, gk), minib,
            unroll=_SGD_UNROLL)
        return (opt_state, params, k), stats

    (opt_state, params, _), stats = jax.lax.scan(
        learn_on_batch, (opt_state, params, rng), (), length=UPDATES)
    return opt_state, params, stats


def timeit(tag, f, *args, iters=10):
    out = f(*args)
    jax.block_until_ready(out)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{tag:24s} {dt*1e3:9.2f} ms", flush=True)
    return dt, out


jc = jax.jit(collect)
js = jax.jit(sgd, donate_argnums=(0, 1))

policy_params = (norm_params, params.policy)
dt_roll, (env_state2, batch) = timeit("rollout half", jc, env_state,
                                      policy_params, rng)
env_steps = rollouts_per_step * UNROLL * NUM_ENVS
print(f"  rollout sps: {env_steps/dt_roll:,.0f} env-steps/s", flush=True)

# freeze a batch for the SGD half (donation: rebuild args each call)
t_iters = 10
out = js(opt_state, params, batch, rng)
jax.block_until_ready(out)
opt2, par2, _ = out
out = js(opt2, par2, batch, rng)
jax.block_until_ready(out)
opt2, par2, _ = out
t0 = time.perf_counter()
for _ in range(t_iters):
    opt2, par2, stats = js(opt2, par2, batch, rng)
jax.block_until_ready(stats)
dt_sgd = (time.perf_counter() - t0) / t_iters
print(f"{'sgd half':24s} {dt_sgd*1e3:9.2f} ms "
      f"({UPDATES*MINIB} updates)", flush=True)

total = dt_roll + dt_sgd
print(f"\nsplit: rollout {dt_roll/total*100:.1f}%  "
      f"sgd {dt_sgd/total*100:.1f}%   "
      f"implied training sps {env_steps/total:,.0f}", flush=True)
