"""Mocap data layer: reference clips, preprocessing, multi-clip library.

Re-covers /root/reference/preprocessing/ (mjx_preprocess.py ReferenceClip +
process_clip) and the legacy mocap_preprocess.py capability (clip chunking,
ClipCollection) with the FK running on the first-party physics engine.
"""

from vnl_tpu.data.reference_clip import ReferenceClip, ClipLibrary
from vnl_tpu.data.io import load_clip, load_stac_qpos
from vnl_tpu.data.preprocess import (
    compute_velocity_from_kinematics,
    extract_features,
    make_static_clip,
    process_clip,
)
from vnl_tpu.data.pipeline import (
    ClipCollection,
    load_features_h5,
    process_recording,
    save_clip_pickle,
    save_features_h5,
)
