"""Training stack integration tests on the virtual 8-device CPU mesh."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vnl_tpu import envs, models, training
from vnl_tpu.training import checkpoint as ckpt_lib


@pytest.fixture(scope="module")
def tiny_train_result(tmp_path_factory):
    env = envs.get_environment("ant")
    ckpt_dir = str(tmp_path_factory.mktemp("ckpt"))
    progress_calls = []
    make_policy, params, metrics = training.train(
        env, num_timesteps=512, episode_length=8, num_envs=16,
        num_eval_envs=8, learning_rate=3e-4, unroll_length=4, batch_size=8,
        num_minibatches=4, num_updates_per_batch=1, num_evals=2,
        normalize_observations=True, seed=0,
        progress_fn=lambda step, m: progress_calls.append((step, m)),
        checkpoint_dir=ckpt_dir)
    return make_policy, params, metrics, progress_calls, ckpt_dir


def test_train_runs_and_reports(tiny_train_result):
    make_policy, params, metrics, progress_calls, _ = tiny_train_result
    assert "eval/episode_reward" in metrics
    assert np.isfinite(metrics["eval/episode_reward"])
    assert len(progress_calls) >= 1
    assert any("training/sps" in m for _, m in progress_calls)


def test_trained_policy_runs(tiny_train_result):
    make_policy, params, *_ = tiny_train_result
    env = envs.get_environment("ant")
    state = jax.jit(env.reset)(jax.random.PRNGKey(0))
    policy = make_policy(params, deterministic=True)
    action, _ = policy(state.info["traj"], state.obs, jax.random.PRNGKey(1))
    assert action.shape == (env.action_size,)
    assert np.all(np.abs(np.asarray(action)) <= 1.0)


def test_checkpoint_roundtrip(tiny_train_result, tmp_path):
    *_, ckpt_dir = tiny_train_result
    latest = ckpt_lib.latest_checkpoint(ckpt_dir)
    assert latest is not None
    # restore into a freshly-initialized state and compare param trees
    env = envs.get_environment("ant")
    state0 = jax.jit(env.reset)(jax.random.PRNGKey(0))
    net = models.make_intention_ppo_networks(
        state0.info["traj"].shape[-1], state0.obs.shape[-1], env.action_size)
    import optax
    from vnl_tpu.training.losses import PPONetworkParams
    from vnl_tpu.training import running_statistics
    init_params = PPONetworkParams(
        policy=net.policy_network.init(jax.random.PRNGKey(0)),
        value=net.value_network.init(jax.random.PRNGKey(1)))
    # wrap obs like training did (episode wrapper adds nothing to obs)
    template = training.train.__globals__["TrainingState"](
        optimizer_state=optax.adam(
            optax.constant_schedule(3e-4)).init(init_params),
        params=init_params,
        normalizer_params=running_statistics.init_state(
            state0.obs.shape[-1:]),
        env_steps=jnp.zeros((), jnp.int32))
    restored = ckpt_lib.restore(latest, template)
    assert int(np.asarray(restored.env_steps)) > 0
    # normalizer saw data
    assert float(np.asarray(restored.normalizer_params.count)) > 0


def test_save_load_params_roundtrip(tiny_train_result, tmp_path):
    _, params, *_ = tiny_train_result
    path = os.path.join(str(tmp_path), "params")
    ckpt_lib.save_params(path, params)
    loaded = ckpt_lib.load_params(path, params)
    tree_ok = jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: np.allclose(np.asarray(a), np.asarray(b)),
        params, loaded))
    assert tree_ok


def test_learning_improves_reward_on_ant():
    """Reward must actually IMPROVE, not merely stay finite: ~60k steps of
    ant tracking on the CPU mesh lifts eval episode reward above the
    untrained policy's (fixed seed; ~4 min).  This is the asserting
    learning test the round-1 review required in place of the old
    finite-loss smoke check."""
    env = envs.get_environment("ant")
    rewards = []
    losses_seen = []

    def progress(step, metrics):
        if "eval/episode_reward" in metrics:
            rewards.append(float(metrics["eval/episode_reward"]))
        if "training/total_loss" in metrics:
            losses_seen.append(metrics["training/total_loss"])

    training.train(
        env, num_timesteps=60000, episode_length=60, num_envs=32,
        num_eval_envs=16, learning_rate=1e-3, entropy_cost=1e-3,
        unroll_length=8, batch_size=16, num_minibatches=4,
        num_updates_per_batch=4, num_evals=4, normalize_observations=True,
        seed=2, progress_fn=progress)
    assert all(np.isfinite(l) for l in losses_seen)
    first, later = rewards[0], rewards[1:]
    assert np.mean(later) > first, rewards
    assert max(later) > 1.1 * first, rewards


def test_vanilla_ppo_on_humanoid_standing():
    """BASELINE config #2 path: vanilla locomotion task through the shared
    PPO stack (traj pathway mirrors obs)."""
    env = envs.get_environment("humanoidstanding")
    _, _, metrics = training.train(
        env, num_timesteps=256, episode_length=4, num_envs=8,
        num_eval_envs=4, unroll_length=2, batch_size=8, num_minibatches=2,
        num_updates_per_batch=1, num_evals=2, normalize_observations=True,
        seed=0)
    assert np.isfinite(metrics["eval/episode_reward"])


def test_training_determinism():
    """Fixed seed => bit-identical trained parameters (BASELINE: exact env
    trajectories under fixed seed; learning curve reproducibility)."""
    env = envs.get_environment("ant")

    def run():
        _, params, _ = training.train(
            env, num_timesteps=256, episode_length=4, num_envs=8,
            num_eval_envs=4, unroll_length=2, batch_size=8,
            num_minibatches=2, num_updates_per_batch=1, num_evals=2,
            normalize_observations=True, seed=7)
        return params

    p1, p2 = run(), run()
    identical = jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: bool(np.array_equal(np.asarray(a), np.asarray(b))),
        p1, p2))
    assert identical


def test_fault_recovery_restarts_interval(monkeypatch):
    """A device fault mid-interval restores the interval-start snapshot,
    halves the program cap, and training still reaches num_timesteps with
    finite replicated params (round-2/3 UNAVAILABLE-fault machinery)."""
    monkeypatch.setenv("VNL_TPU_FAULT_INJECT", "1")
    monkeypatch.setenv("VNL_TPU_MAX_STEPS_PER_PROGRAM", "2")
    env = envs.get_environment("ant")
    make_policy, params, metrics = training.train(
        env, num_timesteps=512, episode_length=8, num_envs=16,
        num_eval_envs=8, learning_rate=3e-4, unroll_length=4, batch_size=8,
        num_minibatches=4, num_updates_per_batch=1, num_evals=2,
        normalize_observations=True, seed=0)
    assert "eval/episode_reward" in metrics
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(params))


def test_evaluator_per_clip_rewards():
    """Multi-clip eval reports per-clip episode reward (eval/episode_
    reward_clipK), keyed by the clip ids the eval episodes sampled."""
    import functools
    import yaml

    from vnl_tpu.data.io import load_clip
    from vnl_tpu.data.reference_clip import ClipLibrary
    from vnl_tpu.training import acting

    cfg = yaml.safe_load(open(
        "/root/repo/configs/env_config.yaml"))["env"]
    clip = load_clip("/root/reference/clips/transform_snips_groom.p")
    clip2 = jax.tree_util.tree_map(
        lambda x: None if x is None else x[::-1], clip)
    lib = ClipLibrary.from_clips([clip, clip2])
    env = envs.get_environment("rodent_multiclip", clip_library=lib,
                               **cfg["env_args"])
    wrapped = envs.wrap_for_training(env, episode_length=4)

    state = jax.jit(wrapped.reset)(jax.random.split(jax.random.PRNGKey(0), 8))
    net = models.make_intention_ppo_networks(
        state.info["traj"].shape[-1], state.obs.shape[-1], env.action_size,
        encoder_layer_sizes=(32,), decoder_layer_sizes=(32,),
        value_hidden_layer_sizes=(32,))
    params = (None, net.policy_network.init(jax.random.PRNGKey(1)))
    make_policy = models.make_inference_fn(net)

    evaluator = acting.Evaluator(
        wrapped, functools.partial(make_policy, deterministic=True),
        num_eval_envs=8, episode_length=4, action_repeat=1,
        key=jax.random.PRNGKey(2))
    out = evaluator.run_evaluation(params, training_metrics={})
    per_clip = [k for k in out if k.startswith("eval/episode_reward_clip")]
    assert per_clip, out.keys()
    for k in per_clip:
        assert np.isfinite(out[k])


def test_adaptive_clip_weights():
    """Adaptive multi-clip sampling: weights are a traced reset argument
    (no recompile across refreshes), the trainer grows weight on the worst
    clip each eval interval, and weights are logged."""
    import functools
    import yaml

    from vnl_tpu.data.io import load_clip
    from vnl_tpu.data.reference_clip import ClipLibrary

    cfg = yaml.safe_load(open(
        "/root/repo/configs/env_config.yaml"))["env"]
    clip = load_clip("/root/reference/clips/transform_snips_groom.p")
    clip2 = jax.tree_util.tree_map(
        lambda x: None if x is None else x[::-1], clip)
    lib = ClipLibrary.from_clips([clip, clip2])
    env = envs.get_environment("rodent_multiclip", clip_library=lib,
                               **cfg["env_args"])

    # weighted reset honors extreme weights (all mass on clip 1)
    wrapped = envs.wrap_for_training(env, episode_length=4)
    keys = jax.random.split(jax.random.PRNGKey(0), 16)
    st = jax.jit(lambda k, w: wrapped.reset(k, clip_weights=w))(
        keys, jnp.asarray([1e-6, 1.0]))
    assert int(np.asarray(st.info["clip_id"]).sum()) == 16

    logged = {}

    def progress(step, metrics):
        logged.update({k: v for k, v in metrics.items()
                       if "clip_weight" in k})

    training.train(
        environment=env,
        num_timesteps=512, episode_length=4, num_envs=8, num_eval_envs=8,
        unroll_length=2, batch_size=8, num_minibatches=2,
        num_updates_per_batch=1, num_evals=3, seed=0,
        network_factory=functools.partial(
            models.make_intention_ppo_networks,
            encoder_layer_sizes=(16,), decoder_layer_sizes=(16,),
            value_hidden_layer_sizes=(16,)),
        progress_fn=progress,
        adaptive_clip_weights=True,
    )
    assert "training/clip_weight_0" in logged and \
        "training/clip_weight_1" in logged
    w = np.array([logged["training/clip_weight_0"],
                  logged["training/clip_weight_1"]])
    np.testing.assert_allclose(w.sum(), 1.0, atol=1e-5)
    assert (w > 0.05).all()
