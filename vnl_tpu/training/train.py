"""Intention-PPO trainer: donated jitted programs under shard_map on a Mesh.

Re-engineers the reference's forked-brax trainer
(/root/reference/ppo_imitation/train.py:62-491) TPU-first: instead of
jax.pmap, each training program is jitted once and shard_mapped over an
explicit device Mesh — envs sharded along the mesh "data" axis, parameters
replicated, gradient pmean and normalizer psum as XLA collectives on that
axis.  The epoch structure (rollout scan -> normalizer update -> shuffled
minibatch SGD scans) follows the reference; the execution model does not.

Deviations (documented):
- Full-state checkpointing with resume (params + optimizer + normalizer +
  env_steps); the reference is save-only (SURVEY.md §5.4).
- The number of training steps compiled into one XLA program is capped
  (VNL_TPU_MAX_STEPS_PER_PROGRAM, default 100 — the empirically stable
  value across rounds 1-2) and the host re-invokes the program to fill the
  eval interval: very long training scans have triggered TPU-runtime
  device faults (CLAUDE.md round-1/2 incidents).  On a recoverable device
  fault mid-interval the trainer restores the last host snapshot, HALVES
  the cap, recompiles, and continues — an adaptive back-off instead of a
  hand-tuned constant.
"""

from __future__ import annotations

import functools
import logging
import os
import time
from typing import Callable, Optional

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
# Unroll factor for the minibatch SGD scan (see learn_on_batch).
_SGD_UNROLL = int(os.environ.get("VNL_TPU_SGD_UNROLL", "16"))
if _SGD_UNROLL < 1:
    raise ValueError(f"VNL_TPU_SGD_UNROLL={_SGD_UNROLL} must be >= 1")


@struct.dataclass
class TrainingState:
    """Everything the learner carries across steps (and into checkpoints)."""

    optimizer_state: optax.OptState
    params: PPONetworkParams
    normalizer_params: running_statistics.RunningStatisticsState
    env_steps: jax.Array


def _steps_dtype():
    return jnp.int64 if jax.config.jax_enable_x64 else jnp.int32


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
    adaptive_clip_weights: bool = False,
):
    """Runs PPO; returns (make_policy, (normalizer_params, policy_params),
    metrics).  Argument semantics follow ppo_imitation/train.py:62-147."""
    if batch_size * num_minibatches % num_envs != 0:
        raise ValueError(
            "num_envs must divide batch_size * num_minibatches")
    start_walltime = time.time()

    # Keep the solver scans rolled inside the (very large) training
    # programs: full unroll is a ~17% step win in small rollout programs but
    # has triggered TPU device faults when multiplied into the epoch graph
    # (CLAUDE.md round-1 incidents). Users can override explicitly.
    os.environ.setdefault("VNL_TPU_SOLVER_UNROLL", "1")

    mesh = mesh_lib.create_mesh(num_devices, _AXIS)
    n_chips = mesh.devices.size
    process_count = jax.process_count()
    process_id = jax.process_index()
    logging.info("mesh devices: %d, process count: %d (id %d)",
                 n_chips, process_count, process_id)
    if num_envs % n_chips != 0:
        raise ValueError(f"num_envs={num_envs} not divisible by {n_chips}")

    steps_per_training_step = (
        batch_size * unroll_length * num_minibatches * action_repeat)
    intervals = max(num_evals - 1, 1)
    steps_per_interval = int(np.ceil(
        num_timesteps / (intervals * steps_per_training_step)))
    # cap the scan length compiled into any single program; the host loops
    # the program to cover the interval.  Round-1 pinned this to 50 after
    # TPU UNAVAILABLE faults; a round-2 probe ran scan(147) for 9M steps
    # clean but an identical-shape scan(167) run then crashed in its first
    # interval while cap=100 stayed stable for hours — so the default is
    # the empirically stable 100, and on a fault the trainer adaptively
    # halves the cap instead of relying on this constant.
    program_cap = max(1, int(os.environ.get(
        "VNL_TPU_MAX_STEPS_PER_PROGRAM", "100")))

    # PRNG topology (ref :185-192): env/epoch keys are per-process, network
    # init keys are global so every host initializes identical params.
    root = jax.random.PRNGKey(seed)
    net_key, proc_key = jax.random.split(root)
    proc_key = jax.random.fold_in(proc_key, process_id)
    proc_key, env_key, eval_key = jax.random.split(proc_key, 3)
    policy_init_key, value_init_key = jax.random.split(net_key)

    env = envs_lib.wrap_for_training(
        environment, episode_length=episode_length,
        action_repeat=action_repeat)

    sharded = NamedSharding(mesh, P(_AXIS))
    replicated = NamedSharding(mesh, P())

    def put_sharded_rows(local_rows):
        """Global data-axis array from per-process rows.  device_put with a
        non-addressable sharding asserts value equality across processes —
        wrong for deliberately per-process streams (env/program keys, ref
        ppo_imitation/train.py:185-192) — so multi-process goes through
        make_array_from_process_local_data."""
        if process_count == 1:
            return jax.device_put(local_rows, sharded)
        return jax.make_array_from_process_local_data(sharded, local_rows)

    num_envs_local = num_envs // process_count
    env_state = jax.jit(env.reset, out_shardings=sharded)(
        put_sharded_rows(jax.random.split(env_key, num_envs_local)))

    normalize = (running_statistics.normalize if normalize_observations
                 else (lambda x, y: x))
    ppo_network = network_factory(
        env_state.info["traj"].shape[-1],
        env_state.obs.shape[-1],
        env.action_size,
        preprocess_observations_fn=normalize)
    make_policy = models_lib.make_inference_fn(ppo_network)

    # (Measured dead end, round 3: optax.flatten-ing the optimizer to fuse
    # adam's per-leaf kernels made the SGD half 1.56x SLOWER on TPU —
    # 129 -> 202 ms/training step — the ravel/unflatten copies cost more
    # than the launch overhead they save.  Keep per-leaf adam.)
    optimizer = optax.adam(optax.constant_schedule(learning_rate))
    loss_fn = functools.partial(
        ppo_losses.compute_ppo_intention_loss,
        ppo_network=ppo_network, entropy_cost=entropy_cost,
        discounting=discounting, reward_scaling=reward_scaling,
        gae_lambda=gae_lambda, clipping_epsilon=clipping_epsilon,
        normalize_advantage=normalize_advantage, kl_weight=kl_weight)
    update_step = gradients.gradient_update_fn(
        loss_fn, optimizer, axis_name=_AXIS, has_aux=True)

    rollouts_per_step = batch_size * num_minibatches // num_envs

    def collect_rollouts(policy, env_state, rng):
        """Fills one training batch: rollouts_per_step unrolls of
        unroll_length, flattened to [B_local, T] leading dims."""

        def one_unroll(carry, _):
            state, k = carry
            unroll_key, k = jax.random.split(k)
            state, chunk = acting.generate_unroll(
                env, state, policy, unroll_key, unroll_length,
                extra_fields=("truncation", "traj"))
            return (state, k), chunk

        (env_state, _), batch = jax.lax.scan(
            one_unroll, (env_state, rng), (), length=rollouts_per_step)
        # [rollouts, T, B_env, ...] -> [rollouts * B_env, T, ...]
        def flatten(x):
            x = jnp.swapaxes(x, 1, 2)
            return x.reshape((-1,) + x.shape[2:])

        return env_state, jax.tree_util.tree_map(flatten, batch)

    def learn_on_batch(carry, _, batch, normalizer_params):
        """One pass over the batch: shuffle, split into minibatches, scan
        gradient updates (grads pmean'd over the mesh inside update_step)."""
        opt_state, net_params, rng = carry
        shuffle_rng, grad_rng, rng = jax.random.split(rng, 3)

        n_rows = batch.observation.shape[0]
        order = jax.random.permutation(shuffle_rng, n_rows)
        minibatched = jax.tree_util.tree_map(
            lambda x: x[order].reshape((num_minibatches, -1) + x.shape[1:]),
            batch)

        def apply_minibatch(carry, minibatch):
            opt_state, net_params, k = carry
            k, loss_key = jax.random.split(k)
            (_, stats), net_params, opt_state = update_step(
                net_params, normalizer_params, minibatch, loss_key,
                optimizer_state=opt_state)
            return (opt_state, net_params, k), stats

        # Partially unrolling the minibatch scan lets XLA overlap the small
        # per-update launches (TPU probe @1024 envs, 512 updates: unroll 1
        # -> 129 ms, 16 -> 104 ms, full 32 -> 141 ms; sweet spot 16).
        (opt_state, net_params, _), stats = jax.lax.scan(
            apply_minibatch, (opt_state, net_params, grad_rng), minibatched,
            unroll=min(_SGD_UNROLL, num_minibatches))
        return (opt_state, net_params, rng), stats

    def one_training_step(carry, _):
        ts, env_state, rng = carry
        rollout_rng, learn_rng, rng = jax.random.split(rng, 3)
        policy = make_policy((ts.normalizer_params, ts.params.policy))

        env_state, batch = collect_rollouts(policy, env_state, rollout_rng)

        normalizer_params = running_statistics.update(
            ts.normalizer_params, batch.observation, axis_name=_AXIS)

        (opt_state, net_params, _), stats = jax.lax.scan(
            functools.partial(learn_on_batch, batch=batch,
                              normalizer_params=normalizer_params),
            (ts.optimizer_state, ts.params, learn_rng), (),
            length=num_updates_per_batch)

        ts = TrainingState(
            optimizer_state=opt_state, params=net_params,
            normalizer_params=normalizer_params,
            env_steps=ts.env_steps + steps_per_training_step)
        return (ts, env_state, rng), stats

    _programs = {}

    def get_program(scan_len):
        """Jitted training program scanning scan_len training steps; cached
        per length so the adaptive back-off pays one compile per cap."""
        if scan_len in _programs:
            return _programs[scan_len]

        def run_program(ts, env_state, rng):
            # rng arrives per-device with a leading shard axis of 1
            rng = rng.reshape(rng.shape[-1:]) if rng.ndim > 1 else rng
            (ts, env_state, _), stats = jax.lax.scan(
                one_training_step, (ts, env_state, rng), (),
                length=scan_len)
            stats = jax.lax.pmean(
                jax.tree_util.tree_map(jnp.mean, stats), _AXIS)
            return ts, env_state, stats

        _programs[scan_len] = jax.jit(
            mesh_lib.shard_map_fn(
                run_program, mesh,
                in_specs=(P(), P(_AXIS), P(_AXIS)),
                out_specs=(P(), P(_AXIS), P())),
            donate_argnums=(0, 1))
        return _programs[scan_len]

    def fresh_env_state(key):
        return jax.jit(env.reset, out_shardings=sharded)(
            put_sharded_rows(jax.random.split(key, num_envs_local)))

    # ---- adaptive multi-clip sampling (ClipCollection weighting design,
    # reference mocap_preprocess.py:343-376): each eval interval, clip
    # sampling weights grow on the clips the policy scores worst on, and
    # envs re-reset with the new weights (clip ids are pinned per env
    # between resets — the AutoReset snapshot restores them).  Weights are
    # a TRACED reset argument, so refreshing them never recompiles.
    clip_lib = getattr(environment, "_library", None)
    adaptive_clip_weights = adaptive_clip_weights and clip_lib is not None
    if adaptive_clip_weights:
        if process_count > 1:
            raise NotImplementedError(
                "adaptive_clip_weights needs a cross-process weight "
                "broadcast; run single-process or disable it")
        _weighted_reset = jax.jit(
            lambda keys, w: env.reset(keys, clip_weights=w),
            out_shardings=sharded)

    def _refresh_clip_weights(metrics, key):
        """New (num_clips,) weights from per-clip eval rewards: a clip at
        the best reward keeps the floor weight, a clip at 0 (or never
        evaluated) gets floor + 1."""
        n = clip_lib.num_clips
        rew = np.zeros(n)
        for c in range(n):
            rew[c] = float(metrics.get(f"eval/episode_reward_clip{c}", 0.0))
        deficit = 1.0 - rew / (rew.max() + 1e-8)
        w = np.maximum(deficit, 0.0) + 0.25
        w = w / w.sum()
        state = _weighted_reset(
            put_sharded_rows(jax.random.split(key, num_envs_local)),
            jnp.asarray(w, jnp.float32))
        return state, w

    training_walltime = 0.0
    _MAX_FAULT_RETRIES = max(0, int(os.environ.get(
        "VNL_TPU_FAULT_RETRIES", "2")))
    # test hook: raise one synthetic device fault inside the first program
    # invocation so the snapshot-restore + cap-back-off path is exercised
    # by the CPU suite (tests/test_training.py::test_fault_recovery)
    _inject_faults = int(os.environ.get("VNL_TPU_FAULT_INJECT", "0"))

    def _is_device_fault(e) -> bool:
        s = str(e)
        return any(tag in s for tag in
                   ("UNAVAILABLE", "INTERNAL", "device error",
                    "DEADLINE_EXCEEDED", "ABORTED"))

    _copy_state = jax.jit(
        lambda ts: jax.tree_util.tree_map(lambda x: x + 0, ts),
        donate_argnums=())

    def snapshot_device(ts):
        """On-device copy of the TrainingState (a ~20 MB HBM copy, ~us) and
        an async D2H transfer started immediately.  The copy is never
        donated, so it survives the interval's donating programs; the D2H
        overlaps the interval instead of stalling it (a SYNCHRONOUS
        device_get of the state through the TPU relay measured ~15 s —
        ~25% of a 150-step interval, the round-3/4 bench-vs-in-program
        gap)."""
        snap = _copy_state(ts)
        for leaf in jax.tree_util.tree_leaves(snap):
            if hasattr(leaf, "copy_to_host_async"):
                leaf.copy_to_host_async()
        return snap

    def run_interval(ts, env_state, rng, snap_dev):
        """Covers one eval interval (steps_per_interval training steps) by
        repeatedly invoking the jitted program — ASYNC: every program in the
        interval is enqueued without a host sync (dispatch is futures-only;
        programs chain through donated buffers on device) and the host
        blocks ONCE at interval end.  Per-program device_get/block was a TPU
        relay round-trip every ~100 training steps (VERDICT r3 §weak-1).

        ``snap_dev`` is the caller's DEVICE-side copy of ``ts`` at the
        interval boundary.  On a recoverable device fault — which surfaces
        at the single sync point or at a later dispatch — the state is
        re-copied from the device snapshot (kept intact for further
        retries), the program cap is halved (adaptive back-off, CLAUDE.md
        UNAVAILABLE incidents), envs are re-reset, and the INTERVAL
        RESTARTS.  Faults that corrupt device memory kill the process and
        are the watchdog + orbax-resume path's job
        (tools/train_resilient.sh), as are hangs (no exception)."""
        nonlocal training_walltime, program_cap, _inject_faults
        t0 = time.time()
        retries = 0
        while True:  # one iteration per interval attempt
            try:
                # even split under the cap (may overshoot the interval by a
                # few steps, like round 2's schedule) so every program in
                # the interval shares ONE compiled length.
                n_prog = int(np.ceil(steps_per_interval / program_cap))
                scan_len = int(np.ceil(steps_per_interval / n_prog))
                stats_acc = []
                steps_done = 0
                attempt_rng = rng
                while steps_done < steps_per_interval:
                    attempt_rng, program_rng = jax.random.split(attempt_rng)
                    program_keys = put_sharded_rows(jax.random.split(
                        program_rng, jax.local_device_count()))
                    if _inject_faults > 0:
                        _inject_faults -= 1
                        raise RuntimeError(
                            "UNAVAILABLE: injected test device fault")
                    ts, env_state, stats = get_program(scan_len)(
                        ts, env_state, program_keys)
                    stats_acc.append(stats)
                    steps_done += scan_len
                # the ONE host sync per interval; device faults from any
                # enqueued program surface here (or at a dispatch above).
                # Stats are PACKED into one (n_prog, n_names) device array
                # first: device_get on the raw list moves every scalar leaf
                # as its own host-device transfer, and the TPU relay charges
                # ~100ms latency per transfer (~6.6s/interval of pure
                # readback at cap=100 — the residual bench-vs-in-program sps
                # gap after the round-4 async-snapshot fix).
                stat_names = sorted(stats_acc[0])
                packed = jnp.stack([
                    jnp.stack([s[n] for n in stat_names]) for s in stats_acc])
                stats_host = np.asarray(jax.device_get(packed))
                break
            except Exception as e:  # noqa: BLE001 — classified below
                if not _is_device_fault(e) or retries >= _MAX_FAULT_RETRIES:
                    raise
                retries += 1
                program_cap = max(10, program_cap // 2)
                logging.warning(
                    "device fault (%s...); backing program cap off to %d "
                    "and restarting the interval (%d/%d)", str(e)[:120],
                    program_cap, retries, _MAX_FAULT_RETRIES)
                rng, reset_key = jax.random.split(rng)
                ts = _copy_state(snap_dev)  # snap stays live for retry 2+
                env_state = fresh_env_state(reset_key)
        elapsed = time.time() - t0
        training_walltime += elapsed
        sps = steps_done * steps_per_training_step / elapsed
        metrics = {
            "training/sps": sps,
            "training/walltime": training_walltime,
            **{f"training/{name}": float(np.mean(stats_host[:, i]))
               for i, name in enumerate(stat_names)},
        }
        return ts, env_state, metrics

    init_params = PPONetworkParams(
        policy=ppo_network.policy_network.init(policy_init_key),
        value=ppo_network.value_network.init(value_init_key))
    training_state = TrainingState(
        optimizer_state=optimizer.init(init_params),
        params=init_params,
        normalizer_params=running_statistics.init_state(
            env_state.obs.shape[-1:]),
        env_steps=jnp.zeros((), _steps_dtype()))
    if restore_checkpoint_path is not None:
        from vnl_tpu.training import checkpoint
        training_state = checkpoint.restore(restore_checkpoint_path,
                                            training_state)
    training_state = jax.device_put(training_state, replicated)

    evaluator = acting.Evaluator(
        envs_lib.wrap_for_training(
            eval_env or environment, episode_length=episode_length,
            action_repeat=action_repeat),
        functools.partial(make_policy, deterministic=deterministic_eval),
        num_eval_envs=num_eval_envs, episode_length=episode_length,
        action_repeat=action_repeat, key=eval_key)

    metrics = {}
    if process_id == 0 and num_evals > 1:
        metrics = evaluator.run_evaluation(
            (training_state.normalizer_params, training_state.params.policy),
            training_metrics={})
        logging.info(metrics)
        progress_fn(0, metrics)

    # num_timesteps is an ABSOLUTE env-step target: a restored run only
    # trains the remaining steps (round-5; previously a resume re-ran the
    # full budget, which broke staged-curriculum schedules that name their
    # stage boundaries in absolute steps).
    current_step = (0 if restore_checkpoint_path is None else
                    int(jax.device_get(training_state.env_steps)))
    # The fault-recovery snapshot lives ON DEVICE (snapshot_device); its
    # host copy streams down in the background and is consumed one interval
    # LATE as the checkpoint payload — so the slow relay D2H never blocks
    # the training loop.  Checkpoints therefore trail live progress by one
    # eval interval (the resume path loses at most one interval's work).
    interval = -1
    while current_step < num_timesteps:
        interval += 1
        logging.info("starting interval %s t=%.1fs", interval,
                     time.time() - start_walltime)
        proc_key, interval_key = jax.random.split(proc_key)
        snap_dev = snapshot_device(training_state)
        training_state, env_state, training_metrics = run_interval(
            training_state, env_state, interval_key, snap_dev)
        # post-interval step count: a scalar fetch, not the 20 MB state
        current_step = int(jax.device_get(training_state.env_steps))

        if process_id == 0:
            params = (training_state.normalizer_params,
                      training_state.params.policy)
            metrics = evaluator.run_evaluation(params, training_metrics)
            if adaptive_clip_weights:
                proc_key, w_key = jax.random.split(proc_key)
                env_state, w = _refresh_clip_weights(metrics, w_key)
                metrics.update({f"training/clip_weight_{c}": float(w[c])
                                for c in range(len(w))})
            logging.info(metrics)
            progress_fn(current_step, metrics)
            policy_params_fn(current_step, make_policy, params)
            if checkpoint_dir is not None and interval > 0:
                from vnl_tpu.training import checkpoint
                # the D2H started at interval BEGIN has had the whole
                # interval to finish; this device_get just collects it
                host_state = jax.device_get(snap_dev)
                checkpoint.save_async(checkpoint_dir,
                                      int(np.asarray(host_state.env_steps)),
                                      host_state)
        del snap_dev

    from vnl_tpu.training import checkpoint
    if checkpoint_dir is not None and process_id == 0:
        # final full-state checkpoint (the in-loop saves trail by one
        # interval); this one synchronous D2H is the run's last act
        checkpoint.save_async(checkpoint_dir, current_step,
                              jax.device_get(training_state))
    checkpoint.wait_for_pending_saves()
    assert current_step >= num_timesteps
    mesh_lib.assert_is_replicated(training_state)
    params = (training_state.normalizer_params, training_state.params.policy)
    logging.info("total steps: %s", current_step)
    mesh_lib.synchronize_hosts()
    return make_policy, params, metrics
