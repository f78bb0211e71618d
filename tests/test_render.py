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


def test_jit_egocentric_camera():
    """Jit/vmap-able egocentric camera (render/jit_camera.py — the in-graph
    equivalent of the reference walker's 64x64 camera observable): compiles
    under jit+vmap, sees the floor plane below the head, and the image
    changes when the head moves."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from vnl_tpu import physics
    from vnl_tpu.data.io import load_clip
    from vnl_tpu.render import make_egocentric_camera

    m = mjcf.load_model("/root/reference/assets/rodent.xml",
                        rescale=(0.9, 0.9), torque_actuators=True)
    clip = load_clip("/root/reference/clips/transform_snips_groom.p")
    qpos0 = np.concatenate([np.asarray(clip.position[0]),
                            np.asarray(clip.quaternion[0]),
                            np.asarray(clip.joints[0])])
    cam = make_egocentric_camera(m, "skull")

    import importlib
    fwd = importlib.import_module("vnl_tpu.physics.forward")

    def frame(qpos):
        d = physics.make_data(m, qpos=qpos)
        d, _ = fwd.fwd_position(m, d)
        return cam(d)

    qposs = jnp.stack([jnp.asarray(qpos0),
                       jnp.asarray(qpos0).at[2].add(0.05)])
    imgs = jax.jit(jax.vmap(frame))(qposs)
    assert imgs.shape == (2, 64, 64, 3)
    imgs = np.asarray(imgs)
    assert np.isfinite(imgs).all() and imgs.min() >= 0 and imgs.max() <= 1
    assert imgs[0].std() > 0.01          # sees structure, not a constant
    assert np.abs(imgs[0] - imgs[1]).max() > 0.01  # pose-dependent


def test_numpy_fk_matches_engine():
    """The renderer's host numpy FK must match the engine's jitted FK
    (it exists so render threads never dispatch to the accelerator)."""
    import jax
    import jax.numpy as jnp
    from vnl_tpu import physics
    from vnl_tpu.render.software import numpy_fk

    m = mjcf.load_model("/root/reference/assets/rodent.xml",
                        rescale=(0.9, 0.9), torque_actuators=True)
    rng = np.random.default_rng(3)
    qpos = np.asarray(m.qpos0).copy()
    qpos[:3] += 0.1 * rng.standard_normal(3)
    q = rng.standard_normal(4)
    qpos[3:7] = q / np.linalg.norm(q)
    qpos[7:] += 0.2 * rng.standard_normal(qpos[7:].shape)

    d = jax.jit(lambda q: physics.kinematics(
        m, physics.make_data(m, qpos=q)))(jnp.asarray(qpos, jnp.float32))
    xpos, xquat, gxpos, gxmat = numpy_fk(m, qpos)
    np.testing.assert_allclose(xpos, np.asarray(d.xpos), atol=1e-5)
    np.testing.assert_allclose(gxpos, np.asarray(d.geom_xpos), atol=1e-5)
    np.testing.assert_allclose(gxmat, np.asarray(d.geom_xmat), atol=1e-5)


def test_skin_parse_and_pose():
    """SKN binary parse + skinning semantics (reference assets/rodent.xml
    <skin file=...>; rendered by reference train.py:310-328)."""
    from vnl_tpu.render.skin import bone_body_ids, load_skn, skin_vertices
    from vnl_tpu.render.software import numpy_fk

    m = mjcf.load_model("/root/reference/assets/rodent.xml",
                        rescale=(0.9, 0.9), torque_actuators=True)
    assert m.skin_file and m.skin_file.endswith(".skn")
    skin = load_skn(m.skin_file)
    assert skin.verts.shape[1] == 3 and skin.faces.shape[1] == 3
    assert skin.faces.max() < skin.verts.shape[0]
    # weights normalized per vertex
    np.testing.assert_allclose(skin.weights.sum(axis=1), 1.0, atol=1e-4)
    # every bone names a real body
    bids = bone_body_ids(skin, m.body_names)
    assert (bids > 0).all()

    xpos, xquat, _, _ = numpy_fk(m, np.asarray(m.qpos0))
    verts = skin_vertices(skin, bids, xpos, xquat)
    # the posed hide must wrap the skeleton: centroid near body centroid,
    # extent within ~2x the skeleton's bounding box
    assert np.linalg.norm(verts.mean(0) - xpos[1:].mean(0)) < 0.1
    ext_v = verts.max(0) - verts.min(0)
    ext_b = xpos.max(0) - xpos.min(0) + 1e-3
    assert (ext_v < 2.5 * ext_b + 0.2).all()


def test_skin_render_overlay():
    """Skinned instance rasterizes into the z-buffered frame."""
    from vnl_tpu.render.skin import load_skn
    from vnl_tpu.render.software import SoftwareRenderer

    m = mjcf.load_model("/root/reference/assets/rodent.xml",
                        rescale=(0.9, 0.9), torque_actuators=True)
    skin = load_skn(m.skin_file, scale=0.9)
    r_skin = SoftwareRenderer(m, 160, 120, skin=skin)
    r_geom = SoftwareRenderer(m, 160, 120)
    q = np.asarray(m.qpos0)
    img_s = r_skin.render([q])
    img_g = r_geom.render([q])
    assert img_s.shape == (120, 160, 3)
    # the skin drew something, and something different from the geom pass
    assert img_s.std() > 1.0
    assert np.abs(img_s.astype(int) - img_g.astype(int)).mean() > 0.5
    # "auto" resolves the model's skin_file
    r_auto = SoftwareRenderer(m, 64, 48, skin="auto")
    assert r_auto.skin is not None
