"""Sensor evaluation (mj_sensorVel/mj_sensorAcc subset).

Covers the sensor set the reference assets declare
(/root/reference/assets/rodent.xml sensor block, consumed by the walker's
proprioceptive observables, /root/reference/walker.py:374-386):
gyro / velocimeter / accelerometer at a site, touch at a site, and
subtreelinvel of a body.  Evaluated after forward dynamics; validated
against mujoco's d.sensordata in tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from vnl_tpu import math as vmath
from vnl_tpu.physics.model import Data, GeomType, Model, SensorType


def _site_frames(m: Model, d: Data):
    sb = jnp.asarray(m.site_bodyid)
    pos = d.xpos[sb] + vmath.quat_rotate(d.xquat[sb], m.site_pos)
    mat = vmath.quat_to_mat(vmath.quat_mul(d.xquat[sb], m.site_quat))
    return pos, mat


def sensors(m: Model, d: Data) -> jax.Array:
    """Returns sensordata (nsensordata,)."""
    dtype = d.qpos.dtype
    if m.nsensordata == 0:
        return jnp.zeros(0, dtype)
    site_xpos, site_xmat = _site_frames(m, d)

    root = jnp.asarray(m.body_rootid)
    origin_all = d.subtree_com[root]  # (nbody, 3) per-tree com origins

    def point_vel(body, point):
        """Classical velocity of a world point on a body (com-frame cvel)."""
        v = d.cvel[body]
        return v[3:] + jnp.cross(v[:3], point - origin_all[body])

    # total acceleration (post-constraint): cacc = chain @ (cdof*qacc +
    # cdof_dot*qvel) - gravity offset; accelerometer measures proper accel
    # (includes -g).
    from vnl_tpu.physics import rne as _rne
    cvel, cdof_dot = _rne.com_vel(m, d)
    chain = jnp.asarray(m.body_chain_dof_mask, dtype)
    cacc = chain @ (d.cdof * d.qacc[:, None] + cdof_dot * d.qvel[:, None])
    grav = jnp.asarray(m.opt.gravity, dtype)
    cacc = cacc.at[:, 3:].add(-grav)

    def point_acc(body, point):
        """Classical linear acceleration of a world point on a body."""
        r = point - origin_all[body]
        a = cacc[body]
        v = d.cvel[body]
        lin_vel = v[3:] + jnp.cross(v[:3], r)
        return a[3:] + jnp.cross(a[:3], r) + jnp.cross(v[:3], lin_vel)

    out = jnp.zeros(m.nsensordata, dtype)
    for i in range(m.nsensor):
        st = SensorType(int(m.sensor_type[i]))
        adr = int(m.sensor_adr[i])
        obj = int(m.sensor_objid[i])
        if st == SensorType.GYRO:
            body = int(m.site_bodyid[obj])
            val = site_xmat[obj].T @ d.cvel[body, :3]
        elif st == SensorType.VELOCIMETER:
            body = int(m.site_bodyid[obj])
            val = site_xmat[obj].T @ point_vel(body, site_xpos[obj])
        elif st == SensorType.ACCELEROMETER:
            body = int(m.site_bodyid[obj])
            val = site_xmat[obj].T @ point_acc(body, site_xpos[obj])
        elif st == SensorType.SUBTREELINVEL:
            # mass-weighted average of body-com velocities over the subtree
            mass = m.body_mass
            vcom = jax.vmap(point_vel, in_axes=(0, 0))(
                jnp.arange(m.nbody), d.xipos)
            sub_mask = jnp.asarray(m.body_subtree_mask, dtype)
            mom = sub_mask @ (mass[:, None] * vcom)
            val = mom[obj] / jnp.maximum(m.body_subtreemass[obj], 1e-12)
        elif st == SensorType.TOUCH:
            body = int(m.site_bodyid[obj])
            val = _touch(m, d, obj, body, site_xpos[obj], site_xmat[obj])
        else:
            continue
        val = jnp.atleast_1d(val)
        out = out.at[adr:adr + int(m.sensor_dim[i])].set(val)
    return out


def _touch(m: Model, d: Data, site: int, body: int, spos, smat):
    """Sum of contact normal forces whose point lies inside the site zone
    (MuJoCo touch semantics: zone membership only — e.g. the rodent's sole
    sites pick up contacts on the toe bodies)."""
    dtype = d.qpos.dtype
    if m.ncon_max == 0:
        return jnp.zeros((), dtype)
    # MuJoCo zone test: the contact registers if a ray cast from the contact
    # point along -normal (toward the sensorized body side) intersects the
    # site volume, and the contact involves the site's body (both verified
    # against mju_rayGeom / oracle sensordata).
    b1 = m.geom_bodyid[m.pair_geom1]
    b2 = m.geom_bodyid[m.pair_geom2]
    # per-contact pair ids follow the collide() emission order, which is the
    # order contact_* arrays use; recompute the static mapping:
    from vnl_tpu.physics import collision as _collision
    con_pair = _collision.pair_expansion(m)
    cb1 = b1[con_pair]
    cb2 = b2[con_pair]
    on_body = jnp.asarray((cb1 == body) | (cb2 == body), dtype)
    local = jnp.einsum("ji,cj->ci", smat, d.contact_pos - spos[None])
    normal = d.contact_frame[:, 0]
    dirs = jnp.einsum("ji,cj->ci", smat, -normal)
    size = m.site_size[site]
    t = int(m.site_type[site])
    big = jnp.asarray(1e9, dtype)
    eps = 1e-12
    if t == int(GeomType.BOX):
        inv = 1.0 / jnp.where(jnp.abs(dirs) > eps, dirs, eps)
        t1 = (-size[None, :] - local) * inv
        t2 = (size[None, :] - local) * inv
        tmin = jnp.max(jnp.minimum(t1, t2), axis=-1)
        tmax = jnp.min(jnp.maximum(t1, t2), axis=-1)
        # parallel-axis miss: if |dir| ~ 0 and |local| > size on that axis
        par_miss = jnp.any((jnp.abs(dirs) <= eps)
                           & (jnp.abs(local) > size[None, :]), axis=-1)
        hit = (tmax >= jnp.maximum(tmin, 0.0)) & ~par_miss
    elif t in (int(GeomType.SPHERE), int(GeomType.ELLIPSOID),
               int(GeomType.CAPSULE)):
        # sphere(ized) test: normalize by radii, solve |o + t d|^2 = 1
        radii = jnp.where(size > eps, size, size[0])
        o = local / radii[None, :]
        dd = dirs / radii[None, :]
        a = jnp.sum(dd * dd, axis=-1)
        b = 2.0 * jnp.sum(o * dd, axis=-1)
        c = jnp.sum(o * o, axis=-1) - 1.0
        disc = b * b - 4.0 * a * c
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        hit = (disc >= 0) & ((c <= 0) | ((-b + sq) >= 0))
    else:
        hit = jnp.zeros(local.shape[0], bool)
    normal_force = jnp.maximum(d.contact_force.sum(axis=-1), 0.0)
    return jnp.sum(normal_force * on_body * hit.astype(dtype))
