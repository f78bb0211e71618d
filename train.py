"""Training driver CLI.

Equivalent of /root/reference/train.py (hydra entry, env registration,
wandb/checkpoint wiring): composes configs/train_config.yaml +
configs/env_config.yaml, builds the tracking env from a reference clip, and
runs the intention-PPO trainer.  Overrides use dotted paths:

  python train.py train.num_timesteps=100000 env.name=rodent
"""

from __future__ import annotations

import functools
import os
import sys
import uuid

import jax
import numpy as np

from vnl_tpu import envs as envs_lib
from vnl_tpu import models as models_lib
from vnl_tpu import training
from vnl_tpu.data.io import load_clip
from vnl_tpu.data.preprocess import process_clip
from vnl_tpu.training import checkpoint as ckpt_lib
from vnl_tpu.utils import MetricsLogger, apply_overrides, load_config

_HERE = os.path.dirname(os.path.abspath(__file__))


def build_env(cfg, for_eval=False):
    """Constructs the training env, or — with for_eval=True — the eval env
    with the reference's eval convention (/root/reference/train.py:95-104):
    sub_clip_length maxed so every eval episode starts at frame 0 and runs
    the whole clip instead of truncating at the training sub-clip cap."""
    env_cfg = cfg["env"]
    name = env_cfg["name"]
    env_args = dict(env_cfg.get("env_args", {}))
    if for_eval and "sub_clip_length" in env_args:
        env_args["sub_clip_length"] = (
            env_args["clip_length"] - env_args.get("ref_traj_length", 5))
        # eval runs whole clips: never sample curriculum horizons here
        env_args["min_sub_clip_length"] = None
    if name == "rodent_multiclip":
        # chunk the recording into clip_length-frame clips, one ClipLibrary
        # entry each (mocap_preprocess.py:343-376 ClipCollection end-to-end)
        import numpy as np

        from vnl_tpu import mjcf
        from vnl_tpu.data.pipeline import process_recording

        clip = load_clip(env_cfg["clip_path"])
        qpos = np.concatenate([np.asarray(clip.position),
                               np.asarray(clip.quaternion),
                               np.asarray(clip.joints)], axis=1)
        model = mjcf.load_model(env_args["mjcf_path"],
                                rescale=(env_args["scale_factor"],) * 2,
                                torque_actuators=True)
        lib = process_recording(model, qpos,
                                clip_length=env_args["clip_length"])
        return envs_lib.get_environment(name, clip_library=lib, **env_args)
    if name == "rodent":
        if env_cfg.get("stac_path"):
            clip = process_clip(
                stac_path=env_cfg["stac_path"],
                mjcf_path=env_args["mjcf_path"],
                scale_factor=env_args["scale_factor"],
                start_step=env_cfg.get("clip_idx", 0)
                * env_args["clip_length"],
                clip_length=env_args["clip_length"])
        else:
            clip = load_clip(env_cfg["clip_path"])
        return envs_lib.get_environment(name, reference_clip=clip,
                                        **env_args)
    if name in ("humanoidtracking",):
        if env_cfg.get("clip_path"):
            clip = load_clip(env_cfg["clip_path"])
            return envs_lib.get_environment(name, reference_clip=clip,
                                            **env_args)
        return envs_lib.get_environment(name, **env_args)  # built-in clip
    return envs_lib.get_environment(name, **env_args)


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    env_cfg = os.path.join(_HERE, "configs", "env_config.yaml")
    for a in argv:  # swap env-config groups, hydra-style: env_config=<path>
        if a.startswith("env_config="):
            env_cfg = a.split("=", 1)[1]
    cfg = load_config(os.path.join(_HERE, "configs", "train_config.yaml"),
                      env_cfg)
    cfg = apply_overrides(cfg, [a for a in argv if "=" in a
                                and not a.startswith("env_config=")])
    tc = cfg["train"]

    env = build_env(cfg)
    eval_env = build_env(cfg, for_eval=True)
    # scale env count by devices, like the reference driver (train.py:128-129)
    num_envs = tc["num_envs"] * jax.device_count()
    batch_size = tc["batch_size"] * jax.device_count()

    run_id = str(uuid.uuid4())[:8]
    model_path = os.path.join(tc["checkpoint_dir"], run_id)
    logger = MetricsLogger(
        project=f"vnl_tpu_{tc['task_name']}", run_name=run_id, config=cfg)

    def progress(num_steps, metrics):
        logger.log(metrics, step=num_steps)
        print(f"[{num_steps:>12}] " + " ".join(
            f"{k.split('/')[-1]}={v:.4g}" for k, v in sorted(metrics.items())
            if isinstance(v, (int, float)) and
            ("episode_reward" in k or "sps" in k)))

    from vnl_tpu.training.eval_callback import EvalCallback
    eval_cb = None

    def policy_params_fn(num_steps, make_policy, params):
        nonlocal eval_cb
        if eval_cb is None:
            eval_cb = EvalCallback(eval_env, make_policy, model_path, logger,
                                   episode_length=tc["episode_length"],
                                   render=bool(tc.get("render_eval", True)))
        eval_cb(num_steps, make_policy, params)

    network_factory = functools.partial(
        models_lib.make_intention_ppo_networks,
        intention_latent_size=tc["intention_latent_size"],
        encoder_layer_sizes=tuple(tc["encoder_layer_sizes"]),
        decoder_layer_sizes=tuple(tc["decoder_layer_sizes"]),
        value_hidden_layer_sizes=tuple(tc["value_hidden_layer_sizes"]),
    )

    make_policy, params, metrics = training.train(
        env,
        num_timesteps=int(tc["num_timesteps"]),
        num_evals=max(2, int(tc["num_timesteps"] / tc["eval_every"])),
        episode_length=tc["episode_length"],
        num_envs=num_envs,
        num_eval_envs=tc["num_eval_envs"],
        learning_rate=tc["learning_rate"],
        entropy_cost=tc["entropy_cost"],
        discounting=tc["discounting"],
        seed=tc["seed"],
        unroll_length=tc["unroll_length"],
        batch_size=batch_size,
        num_minibatches=tc["num_minibatches"],
        num_updates_per_batch=tc["num_updates_per_batch"],
        normalize_observations=tc["normalize_observations"],
        reward_scaling=tc["reward_scaling"],
        clipping_epsilon=tc["clipping_epsilon"],
        gae_lambda=tc["gae_lambda"],
        kl_weight=tc["kl_weight"],
        network_factory=network_factory,
        eval_env=eval_env,
        progress_fn=progress,
        policy_params_fn=policy_params_fn,
        checkpoint_dir=os.path.join(model_path, "state"),
        restore_checkpoint_path=tc.get("restore_checkpoint"),
        adaptive_clip_weights=bool(tc.get("adaptive_clip_weights", False)),
        deterministic_eval=bool(tc.get("deterministic_eval", False)),
    )

    ckpt_lib.save_params(os.path.join(model_path, "finished"), params)
    logger.finish()
    return make_policy, params, metrics


if __name__ == "__main__":
    main()
