"""Multi-clip rodent imitation training (new capability).

The reference's RodentMultiClipTracking is an empty stub
(/root/reference/envs/rodent.py:473-475); this example trains against a
device-resident ClipLibrary where every episode samples a clip id.

  python examples/train_multiclip.py [num_timesteps]
"""

import sys

import numpy as np
import yaml

from vnl_tpu import envs, mjcf, training
from vnl_tpu.data.io import load_clip
from vnl_tpu.data.pipeline import process_recording


def main(num_timesteps: int = 200_000):
    cfg = yaml.safe_load(open("configs/env_config.yaml"))["env"]
    model = mjcf.load_model(cfg["env_args"]["mjcf_path"], rescale=(0.9, 0.9),
                            torque_actuators=True)
    clip = load_clip(cfg["clip_path"])
    qpos = np.concatenate([np.asarray(clip.position),
                           np.asarray(clip.quaternion),
                           np.asarray(clip.joints)], axis=1)
    lib = process_recording(model, qpos, clip_length=125)

    args = dict(cfg["env_args"])
    args.update(clip_length=125, sub_clip_length=10, ref_traj_length=5)
    env = envs.get_environment("rodent_multiclip", clip_library=lib, **args)

    make_policy, params, metrics = training.train(
        env, num_timesteps=num_timesteps, episode_length=50, num_envs=32,
        num_eval_envs=16, learning_rate=6e-4, entropy_cost=1e-3,
        discounting=0.99, unroll_length=10, batch_size=16,
        num_minibatches=4, num_updates_per_batch=2, num_evals=3,
        normalize_observations=True, clipping_epsilon=0.2, kl_weight=1e-4,
        seed=0)
    print({k: round(float(v), 4) for k, v in metrics.items()
           if "episode_reward" in k or "sps" in k})


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 200_000)
