"""Mocap preprocessing: STAC recording -> clip library -> h5.

Script equivalent of the reference's process_traj.ipynb /
clip_rendering.ipynb workflow: chunk a qpos recording into fixed-length
clips, run the on-device FK feature extraction vmapped over all clips, save
as the reference h5 layout, and report per-clip stats for picking "good
clips to imitate".

  python examples/process_clips.py [stac_path.p] [out.h5]
"""

import sys

import numpy as np

from vnl_tpu import mjcf
from vnl_tpu.data.io import load_clip, load_stac_qpos
from vnl_tpu.data.pipeline import process_recording, save_features_h5


def main(stac_path=None, out="/tmp/clips.h5"):
    model = mjcf.load_model("/root/reference/assets/rodent.xml",
                            rescale=(0.9, 0.9), torque_actuators=True)
    if stac_path:
        qpos = load_stac_qpos(stac_path)
    else:
        # demo: reuse the shipped groom clip's qpos as a 'recording'
        clip = load_clip("/root/reference/clips/transform_snips_groom.p")
        qpos = np.concatenate([np.asarray(clip.position),
                               np.asarray(clip.quaternion),
                               np.asarray(clip.joints)], axis=1)

    lib = process_recording(model, qpos, clip_length=125)
    print(f"{lib.num_clips} clips x {lib.clip_length} frames")
    for i in range(lib.num_clips):
        vel = np.asarray(lib.clips.velocity[i])
        print(f"clip_{i}: mean speed {np.linalg.norm(vel, axis=-1).mean():.4f}"
              f" m/s, root z range "
              f"[{np.asarray(lib.clips.position[i])[:, 2].min():.3f}, "
              f"{np.asarray(lib.clips.position[i])[:, 2].max():.3f}]")
    print("saved:", save_features_h5(out, lib))


if __name__ == "__main__":
    main(*sys.argv[1:])
