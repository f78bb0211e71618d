"""Software renderer tests."""

import os

import numpy as np

from vnl_tpu import mjcf
from vnl_tpu.render import SoftwareRenderer, render_overlay_video


def test_render_frame_ant():
    m = mjcf.load_model("/root/reference/assets/ant.xml")
    r = SoftwareRenderer(m, width=160, height=120)
    frame = r.render([np.asarray(m.qpos0)])
    assert frame.shape == (120, 160, 3)
    assert frame.dtype == np.uint8
    # scene is non-empty: geoms + checkerboard produce variation
    assert frame.std() > 5


def test_overlay_video(tmp_path):
    m = mjcf.load_model("/root/reference/assets/ant.xml")
    q = np.tile(np.asarray(m.qpos0), (4, 1))
    q2 = q.copy()
    q2[:, 0] += 0.2
    out = render_overlay_video(m, q, q2, str(tmp_path / "v.mp4"), width=120,
                               height=90)
    assert os.path.exists(out)
    assert os.path.getsize(out) > 0


def test_egocentric_camera():
    """64x64 egocentric head camera (walker.py observable equivalent)."""
    import numpy as np
    from vnl_tpu.data.io import load_clip
    from vnl_tpu.render import render_egocentric
    m = mjcf.load_model("/root/reference/assets/rodent.xml",
                        rescale=(0.9, 0.9), torque_actuators=True)
    clip = load_clip("/root/reference/clips/transform_snips_groom.p")
    qpos = np.concatenate([np.asarray(clip.position[0]),
                           np.asarray(clip.quaternion[0]),
                           np.asarray(clip.joints[0])])
    frame = render_egocentric(m, qpos)
    assert frame.shape == (64, 64, 3)
    assert frame.std() > 1  # sees something
