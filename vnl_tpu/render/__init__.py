"""Offline rendering for eval rollouts.

Covers the reference's host-side video path (/root/reference/train.py:
274-331: MuJoCo C renderer + osmesa, agent-vs-reference ghost overlay via
the *_pair MJCF models).  Primary backend is a first-party numpy software
rasterizer (always available, zero GL deps); a MuJoCo GL backend is used
opportunistically when the platform provides osmesa/egl.
"""

from vnl_tpu.render.jit_camera import make_egocentric_camera
from vnl_tpu.render.software import (SoftwareRenderer, render_egocentric,
                                     render_overlay_video, render_trajectory)
