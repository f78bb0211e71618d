"""Intention-PPO trainer: one donated jitted epoch under shard_map.

Re-implements the reference's forked-brax trainer
(/root/reference/ppo_imitation/train.py:62-491) with a TPU-first execution
model: instead of jax.pmap, the training epoch is a single jitted program
shard_mapped over an explicit device Mesh — envs sharded along the mesh
"data" axis, parameters replicated, gradient pmean and normalizer psum as
XLA collectives on that axis.  Epoch structure matches the reference:

  scan training_step x steps_per_epoch
    scan generate_unroll x (batch*minibatch/num_envs)   # rollout
    normalizer update (psum over mesh)
    scan sgd_step x num_updates_per_batch
      scan minibatch_step x num_minibatches             # pmean(grads)

Additions over the reference (SURVEY.md §5.4): full-state checkpointing
with resume (params + optimizer + normalizer + env_steps) via
vnl_tpu.training.checkpoint.
"""

from __future__ import annotations

import functools
import logging
import time
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import NamedSharding, PartitionSpec as P

from vnl_tpu import envs as envs_lib
from vnl_tpu import models as models_lib
from vnl_tpu.parallel import mesh as mesh_lib
from vnl_tpu.training import acting, gradients, running_statistics
from vnl_tpu.training import losses as ppo_losses
from vnl_tpu.training.losses import PPONetworkParams

_AXIS = "data"


@struct.dataclass
class TrainingState:
    """Learner state (ppo_imitation/train.py:38-45)."""

    optimizer_state: optax.OptState
    params: PPONetworkParams
    normalizer_params: running_statistics.RunningStatisticsState
    env_steps: jax.Array


def train(
    environment: envs_lib.Env,
    num_timesteps: int,
    episode_length: int,
    action_repeat: int = 1,
    num_envs: int = 1,
    num_eval_envs: int = 128,
    learning_rate: float = 1e-4,
    entropy_cost: float = 1e-4,
    discounting: float = 0.9,
    seed: int = 0,
    unroll_length: int = 10,
    batch_size: int = 32,
    num_minibatches: int = 16,
    num_updates_per_batch: int = 2,
    num_evals: int = 1,
    normalize_observations: bool = False,
    reward_scaling: float = 1.0,
    clipping_epsilon: float = 0.3,
    gae_lambda: float = 0.95,
    deterministic_eval: bool = False,
    network_factory=models_lib.make_intention_ppo_networks,
    progress_fn: Callable = lambda *args: None,
    normalize_advantage: bool = True,
    eval_env: Optional[envs_lib.Env] = None,
    policy_params_fn: Callable = lambda *args: None,
    kl_weight: float = 1e-4,
    num_devices: Optional[int] = None,
    restore_checkpoint_path: Optional[str] = None,
    checkpoint_dir: Optional[str] = None,
):
    """PPO training; returns (make_policy, (normalizer_params, policy_params),
    metrics). Argument semantics follow ppo_imitation/train.py:62-147."""
    assert batch_size * num_minibatches % num_envs == 0
    xt = time.time()

    # Keep the solver scans rolled inside the (very large) training-epoch
    # program: full unroll is a ~17% step win in small rollout programs but
    # has triggered TPU device faults when multiplied into the epoch graph
    # (CLAUDE.md round-1 incidents). Users can override explicitly.
    import os
    os.environ.setdefault("VNL_TPU_SOLVER_UNROLL", "1")

    mesh = mesh_lib.create_mesh(num_devices, _AXIS)
    device_count = mesh.devices.size
    process_count = jax.process_count()
    process_id = jax.process_index()
    logging.info(
        "mesh devices: %d, process count: %d (id %d)",
        device_count, process_count, process_id)
    assert num_envs % device_count == 0
    local_envs = num_envs // device_count

    env_step_per_training_step = batch_size * unroll_length * num_minibatches * action_repeat
    num_evals_after_init = max(num_evals - 1, 1)
    num_training_steps_per_epoch = int(np.ceil(
        num_timesteps / (num_evals_after_init * env_step_per_training_step)))

    # PRNG topology (ppo_imitation/train.py:185-192): per-process local keys,
    # global network-init keys.
    key = jax.random.PRNGKey(seed)
    global_key, local_key = jax.random.split(key)
    del key
    local_key = jax.random.fold_in(local_key, process_id)
    local_key, key_env, eval_key = jax.random.split(local_key, 3)
    key_policy, key_value = jax.random.split(global_key)
    del global_key

    env = envs_lib.wrap_for_training(
        environment, episode_length=episode_length,
        action_repeat=action_repeat)

    sharded = NamedSharding(mesh, P(_AXIS))
    replicated = NamedSharding(mesh, P())

    key_envs = jax.random.split(key_env, num_envs)
    reset_fn = jax.jit(env.reset, out_shardings=sharded)
    env_state = reset_fn(jax.device_put(key_envs, sharded))

    normalize = lambda x, y: x
    if normalize_observations:
        normalize = running_statistics.normalize
    ppo_network = network_factory(
        env_state.info["traj"].shape[-1],
        env_state.obs.shape[-1],
        env.action_size,
        preprocess_observations_fn=normalize)
    make_policy = models_lib.make_inference_fn(ppo_network)

    optimizer = optax.adam(optax.constant_schedule(learning_rate))

    loss_fn = functools.partial(
        ppo_losses.compute_ppo_intention_loss,
        ppo_network=ppo_network, entropy_cost=entropy_cost,
        discounting=discounting, reward_scaling=reward_scaling,
        gae_lambda=gae_lambda, clipping_epsilon=clipping_epsilon,
        normalize_advantage=normalize_advantage, kl_weight=kl_weight)

    gradient_update_fn = gradients.gradient_update_fn(
        loss_fn, optimizer, axis_name=_AXIS, has_aux=True)

    def minibatch_step(carry, data, normalizer_params):
        optimizer_state, params, key = carry
        key, key_loss = jax.random.split(key)
        (_, metrics), params, optimizer_state = gradient_update_fn(
            params, normalizer_params, data, key_loss,
            optimizer_state=optimizer_state)
        return (optimizer_state, params, key), metrics

    def sgd_step(carry, unused_t, data, normalizer_params):
        optimizer_state, params, key = carry
        key, key_perm, key_grad = jax.random.split(key, 3)

        def convert_data(x):
            x = jax.random.permutation(key_perm, x)
            return jnp.reshape(x, (num_minibatches, -1) + x.shape[1:])

        shuffled_data = jax.tree_util.tree_map(convert_data, data)
        (optimizer_state, params, _), metrics = jax.lax.scan(
            functools.partial(minibatch_step,
                              normalizer_params=normalizer_params),
            (optimizer_state, params, key_grad), shuffled_data,
            length=num_minibatches)
        return (optimizer_state, params, key), metrics

    def training_step(carry, unused_t):
        training_state, state, key = carry
        key_sgd, key_generate_unroll, new_key = jax.random.split(key, 3)
        policy = make_policy(
            (training_state.normalizer_params, training_state.params.policy))

        def f(carry, unused_t):
            current_state, current_key = carry
            current_key, next_key = jax.random.split(current_key)
            next_state, data = acting.generate_unroll(
                env, current_state, policy, current_key, unroll_length,
                extra_fields=("truncation", "traj"))
            return (next_state, next_key), data

        (state, _), data = jax.lax.scan(
            f, (state, key_generate_unroll), (),
            length=batch_size * num_minibatches // num_envs)
        # leading dims -> (B_local, unroll_length)
        data = jax.tree_util.tree_map(lambda x: jnp.swapaxes(x, 1, 2), data)
        data = jax.tree_util.tree_map(
            lambda x: jnp.reshape(x, (-1,) + x.shape[2:]), data)

        normalizer_params = running_statistics.update(
            training_state.normalizer_params, data.observation,
            axis_name=_AXIS)

        (optimizer_state, params, _), metrics = jax.lax.scan(
            functools.partial(sgd_step, data=data,
                              normalizer_params=normalizer_params),
            (training_state.optimizer_state, training_state.params, key_sgd),
            (), length=num_updates_per_batch)

        new_training_state = TrainingState(
            optimizer_state=optimizer_state, params=params,
            normalizer_params=normalizer_params,
            env_steps=training_state.env_steps + env_step_per_training_step)
        return (new_training_state, state, new_key), metrics

    def training_epoch(training_state, state, key):
        # key arrives per-device with a leading shard axis of 1
        key = key.reshape(key.shape[-1:]) if key.ndim > 1 else key
        (training_state, state, _), loss_metrics = jax.lax.scan(
            training_step, (training_state, state, key), (),
            length=num_training_steps_per_epoch)
        loss_metrics = jax.tree_util.tree_map(jnp.mean, loss_metrics)
        loss_metrics = jax.lax.pmean(loss_metrics, _AXIS)
        return training_state, state, loss_metrics

    training_epoch = mesh_lib.shard_map_fn(
        training_epoch, mesh,
        in_specs=(P(), P(_AXIS), P(_AXIS)),
        out_specs=(P(), P(_AXIS), P()))
    training_epoch = jax.jit(training_epoch, donate_argnums=(0, 1))

    training_walltime = 0.0

    def training_epoch_with_timing(training_state, env_state, key):
        nonlocal training_walltime
        t = time.time()
        training_state, env_state, metrics = training_epoch(
            training_state, env_state, key)
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), metrics)
        epoch_training_time = time.time() - t
        training_walltime += epoch_training_time
        sps = (num_training_steps_per_epoch * env_step_per_training_step
               ) / epoch_training_time
        metrics = {
            "training/sps": sps,
            "training/walltime": training_walltime,
            **{f"training/{name}": float(np.asarray(value))
               for name, value in metrics.items()},
        }
        return training_state, env_state, metrics

    init_params = PPONetworkParams(
        policy=ppo_network.policy_network.init(key_policy),
        value=ppo_network.value_network.init(key_value))
    training_state = TrainingState(
        optimizer_state=optimizer.init(init_params),
        params=init_params,
        normalizer_params=running_statistics.init_state(
            env_state.obs.shape[-1:]),
        env_steps=jnp.zeros((), jnp.int64 if jax.config.jax_enable_x64
                            else jnp.int32))
    if restore_checkpoint_path is not None:
        from vnl_tpu.training import checkpoint
        training_state = checkpoint.restore(restore_checkpoint_path,
                                            training_state)
    training_state = jax.device_put(training_state, replicated)

    if not eval_env:
        eval_env = environment
    eval_env = envs_lib.wrap_for_training(
        eval_env, episode_length=episode_length, action_repeat=action_repeat)
    evaluator = acting.Evaluator(
        eval_env, functools.partial(make_policy,
                                    deterministic=deterministic_eval),
        num_eval_envs=num_eval_envs, episode_length=episode_length,
        action_repeat=action_repeat, key=eval_key)

    metrics = {}
    if process_id == 0 and num_evals > 1:
        metrics = evaluator.run_evaluation(
            (training_state.normalizer_params, training_state.params.policy),
            training_metrics={})
        logging.info(metrics)
        progress_fn(0, metrics)

    training_metrics = {}
    current_step = 0
    for it in range(num_evals_after_init):
        logging.info("starting iteration %s %s", it, time.time() - xt)
        epoch_key, local_key = jax.random.split(local_key)
        epoch_keys = jax.device_put(
            jax.random.split(epoch_key, device_count), sharded)
        training_state, env_state, training_metrics = (
            training_epoch_with_timing(training_state, env_state, epoch_keys))
        current_step = int(np.asarray(training_state.env_steps))

        if process_id == 0:
            metrics = evaluator.run_evaluation(
                (training_state.normalizer_params,
                 training_state.params.policy),
                training_metrics)
            logging.info(metrics)
            progress_fn(current_step, metrics)
            params = (training_state.normalizer_params,
                      training_state.params.policy)
            policy_params_fn(current_step, make_policy, params)
            if checkpoint_dir is not None:
                from vnl_tpu.training import checkpoint
                checkpoint.save(checkpoint_dir, current_step, training_state)

    total_steps = current_step
    assert total_steps >= num_timesteps

    mesh_lib.assert_is_replicated(training_state)
    params = (training_state.normalizer_params, training_state.params.policy)
    logging.info("total steps: %s", total_steps)
    mesh_lib.synchronize_hosts()
    return make_policy, params, metrics
