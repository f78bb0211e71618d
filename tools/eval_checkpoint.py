"""Low-noise deterministic evaluation of a saved policy (round 5).

The trainer's in-loop eval uses the STOCHASTIC policy (reference parity,
ppo_imitation/train.py:84 deterministic_eval=False) over 128 episodes,
which carries +-0.15 reward / +-15 length of noise between intervals —
enough to mask stage effects (CLAUDE.md round-5 learning findings).  This
tool reports the deterministic policy over N seeded full-clip episodes:
one number per checkpoint, comparable across checkpoints.

Usage: python tools/eval_checkpoint.py <ckpt> [n_envs] [--tpu]
Accepts eval-callback params files or orbax TrainingState keeper dirs.
"""

import os
import sys

import jax
if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import yaml

from vnl_tpu import envs as envs_lib
from vnl_tpu import models as models_lib
from vnl_tpu.data.io import load_clip
from vnl_tpu.training import acting
from vnl_tpu.training import checkpoint as ckpt_lib
from vnl_tpu.training import running_statistics

args = [a for a in sys.argv[1:] if not a.startswith("--")]
ckpt = os.path.abspath(args[0])
n_envs = int(args[1]) if len(args) > 1 else 16

cfg = yaml.safe_load(open("configs/env_config.yaml"))["env"]
env_args = dict(cfg["env_args"])
env_args["sub_clip_length"] = (env_args["clip_length"]
                               - env_args.get("ref_traj_length", 5))
env_args["min_sub_clip_length"] = None
clip = load_clip(cfg["clip_path"])
env = envs_lib.get_environment("rodent", reference_clip=clip, **env_args)
episode_length = env_args["sub_clip_length"]

tcfg = yaml.safe_load(open("configs/train_config.yaml"))["train"]
network = models_lib.make_intention_ppo_networks(
    795, env.observation_size, env.action_size,
    intention_latent_size=tcfg["intention_latent_size"],
    encoder_layer_sizes=tuple(tcfg["encoder_layer_sizes"]),
    decoder_layer_sizes=tuple(tcfg["decoder_layer_sizes"]),
    value_hidden_layer_sizes=tuple(tcfg["value_hidden_layer_sizes"]),
    preprocess_observations_fn=running_statistics.normalize)
make_policy = models_lib.make_inference_fn(network)
template = (running_statistics.init_state((env.observation_size,)),
            network.policy_network.init(jax.random.PRNGKey(0)))
if os.path.isdir(ckpt) and (
        os.path.exists(os.path.join(ckpt, "_METADATA"))
        or os.path.exists(os.path.join(ckpt, "manifest.ocdbt"))):
    import optax

    from vnl_tpu.training.losses import PPONetworkParams
    from vnl_tpu.training.train import TrainingState
    net_params = PPONetworkParams(
        policy=template[1],
        value=network.value_network.init(jax.random.PRNGKey(1)))
    ts_template = TrainingState(
        optimizer_state=optax.adam(optax.constant_schedule(
            float(tcfg.get("learning_rate", 6e-4)))).init(net_params),
        params=net_params, normalizer_params=template[0],
        env_steps=jnp.zeros((), jnp.int32))
    ts = ckpt_lib.restore(ckpt, ts_template)
    params = (ts.normalizer_params, ts.params.policy)
    print(f"TrainingState at env_steps={int(ts.env_steps)}", flush=True)
else:
    params = ckpt_lib.load_params(ckpt, template)

evaluator = acting.Evaluator(
    envs_lib.wrap_for_training(env, episode_length=episode_length),
    lambda p: make_policy(p, deterministic=True),
    num_eval_envs=n_envs, episode_length=episode_length, action_repeat=1,
    key=jax.random.PRNGKey(7))
out = evaluator.run_evaluation(params, training_metrics={},
                               aggregate_episodes=False)
rew = np.asarray(out["eval/episode_reward"])
print(f"deterministic eval over {n_envs} full-clip episodes "
      f"(horizon {episode_length}):", flush=True)
print(f"  reward  mean={rew.mean():.3f}  median={np.median(rew):.3f}  "
      f"min={rew.min():.3f}  max={rew.max():.3f}")
print(f"  length  mean={out['eval/avg_episode_length']:.1f} "
      f"of {episode_length}")
