"""Render an imitation rollout from a saved checkpoint (host-side).

Loads (normalizer_params, policy_params) saved by the eval callback,
rolls the deterministic policy on the eval-convention rodent env (start
frame 0, full clip), writes the agent-vs-reference ghost overlay video
and an rtrunk/reward diagnostic plot.

Usage: python tools/render_checkpoint.py [ckpt_path] [out_prefix]
(default: newest step file in the newest model_checkpoints/<run>/)
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
from vnl_tpu.training import checkpoint as ckpt_lib
from vnl_tpu.training import running_statistics


def newest_checkpoint():
    root = "model_checkpoints"
    best, best_mtime = None, -1
    for run in os.listdir(root):
        d = os.path.join(root, run)
        for name in os.listdir(d):
            base = name.removesuffix(".msgpack")
            if base.isdigit():
                p = os.path.join(d, name)
                if os.path.getmtime(p) > best_mtime:
                    best, best_mtime = p, os.path.getmtime(p)
    return best


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    ckpt = os.path.abspath(args[0]) if args else newest_checkpoint()
    out = args[1] if len(args) > 1 else "/tmp/rollout"
    print("checkpoint:", ckpt, flush=True)

    cfg = yaml.safe_load(open("configs/env_config.yaml"))["env"]
    env_args = dict(cfg["env_args"])
    env_args["sub_clip_length"] = (env_args["clip_length"]
                                   - env_args.get("ref_traj_length", 5))
    clip = load_clip(cfg["clip_path"])
    env = envs_lib.get_environment("rodent", reference_clip=clip,
                                   **env_args)
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
        # orbax full-TrainingState checkpoint (checkpoints_keep/ keepers):
        # rebuild the exact pytree template and take (normalizer, policy)
        import optax

        from vnl_tpu.training.losses import PPONetworkParams
        from vnl_tpu.training.train import TrainingState
        net_params = PPONetworkParams(
            policy=template[1],
            value=network.value_network.init(jax.random.PRNGKey(1)))
        lr = float(tcfg.get("learning_rate", 6e-4))
        ts_template = TrainingState(
            optimizer_state=optax.adam(
                optax.constant_schedule(lr)).init(net_params),
            params=net_params,
            normalizer_params=template[0],
            env_steps=jnp.zeros((), jnp.int32))
        ts = ckpt_lib.restore(ckpt, ts_template)
        params = (ts.normalizer_params, ts.params.policy)
        print("loaded TrainingState at env_steps=%d" % int(ts.env_steps),
              flush=True)
    else:
        params = ckpt_lib.load_params(ckpt, template)
    policy = jax.jit(make_policy(params, deterministic=True))

    reset = jax.jit(env.reset)
    step = jax.jit(env.step)
    rng = jax.random.PRNGKey(0)
    state = reset(rng)
    # force start at frame 0 for a clean overlay
    qpos_traj, rtrunk, rewards = [], [], []
    T = env_args["clip_length"] - env_args.get("ref_traj_length", 5) - 1
    for t in range(T):
        rng, key = jax.random.split(rng)
        act, _ = policy(state.info["traj"], state.obs, key)
        state = step(state, act)
        qpos_traj.append(np.asarray(state.pipeline_state.qpos))
        rtrunk.append(float(state.metrics["termination_error"]))
        rewards.append(float(state.reward))
        if state.done:
            break
    print(f"rolled {len(qpos_traj)} steps; mean reward "
          f"{np.mean(rewards):.4f}; final rtrunk {rtrunk[-1]:.4f}",
          flush=True)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, (ax1, ax2) = plt.subplots(2, 1, figsize=(7, 5), sharex=True)
    ax1.plot(rewards, color="#2f6fd6", linewidth=2)
    ax1.set_title("per-step reward (deterministic policy)", loc="left",
                  fontsize=11)
    ax2.plot(rtrunk, color="#1a8a7a", linewidth=2)
    ax2.set_title("rtrunk (1 - tracking error / threshold)", loc="left",
                  fontsize=11)
    ax2.set_xlabel("step")
    for ax in (ax1, ax2):
        ax.grid(True, color="#e4e6ea", linewidth=0.8)
        for s in ("top", "right"):
            ax.spines[s].set_visible(False)
    fig.tight_layout()
    fig.savefig(out + "_diag.png", dpi=130)
    print("wrote", out + "_diag.png", flush=True)

    from vnl_tpu.render import render_overlay_video
    Tq = len(qpos_traj)
    qref = np.concatenate([
        np.asarray(clip.position)[:Tq], np.asarray(clip.quaternion)[:Tq],
        np.asarray(clip.joints)[:Tq]], axis=1)
    path = render_overlay_video(env.sys, np.stack(qpos_traj), qref,
                                out + ".mp4")
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
