"""Physics model/state pytrees.

``Model`` is the compiled, device-resident description of a MuJoCo-format
robot (what the reference gets from ``mjx.put_model``); ``Data`` is the
per-instance dynamic state (``mjx.put_data`` analogue).  Both are flax struct
pytrees: array leaves live in HBM and can be sharded/donated; sizes, enums
and name tables are static aux data so XLA sees fixed shapes.

Integer enum codes deliberately match MuJoCo's (mjtJoint/mjtGeom/...) so that
compiler output can be diffed field-by-field against a ``mujoco.MjModel``
oracle in tests.
"""

from __future__ import annotations

import enum
from typing import Any, Mapping, Optional, Tuple

import jax
import numpy as np
from flax import struct


class JointType(enum.IntEnum):
    FREE = 0
    BALL = 1
    SLIDE = 2
    HINGE = 3


class GeomType(enum.IntEnum):
    PLANE = 0
    HFIELD = 1
    SPHERE = 2
    CAPSULE = 3
    ELLIPSOID = 4
    CYLINDER = 5
    BOX = 6
    MESH = 7


class DynType(enum.IntEnum):
    NONE = 0
    INTEGRATOR = 1
    FILTER = 2
    FILTEREXACT = 3


class GainType(enum.IntEnum):
    FIXED = 0
    AFFINE = 1


class BiasType(enum.IntEnum):
    NONE = 0
    AFFINE = 1


class ConeType(enum.IntEnum):
    PYRAMIDAL = 0
    ELLIPTIC = 1


class SolverType(enum.IntEnum):
    PGS = 0
    CG = 1
    NEWTON = 2


class IntegratorType(enum.IntEnum):
    EULER = 0
    RK4 = 1
    IMPLICIT = 2
    IMPLICITFAST = 3


class SensorType(enum.IntEnum):
    """Sensor kinds used by the reference assets (rodent.xml sensor block)."""

    TOUCH = 0
    ACCELEROMETER = 1
    VELOCIMETER = 2
    GYRO = 3
    SUBTREELINVEL = 4


class DisableBit(enum.IntFlag):
    CONSTRAINT = 1 << 0
    EQUALITY = 1 << 1
    FRICTIONLOSS = 1 << 2
    LIMIT = 1 << 3
    CONTACT = 1 << 4
    PASSIVE = 1 << 5
    GRAVITY = 1 << 6
    CLAMPCTRL = 1 << 7
    ACTUATION = 1 << 10
    EULERDAMP = 1 << 16


def _static(**kwargs):
    return struct.field(pytree_node=False, **kwargs)


@struct.dataclass
class Option:
    """Simulation options (mjOption analogue). All fields static."""

    timestep: float = _static(default=0.002)
    impratio: float = _static(default=1.0)
    tolerance: float = _static(default=1e-8)
    ls_tolerance: float = _static(default=0.01)
    integrator: int = _static(default=int(IntegratorType.EULER))
    cone: int = _static(default=int(ConeType.PYRAMIDAL))
    solver: int = _static(default=int(SolverType.NEWTON))
    iterations: int = _static(default=100)
    ls_iterations: int = _static(default=50)
    disableflags: int = _static(default=0)
    gravity: Tuple[float, float, float] = _static(default=(0.0, 0.0, -9.81))
    wind: Tuple[float, float, float] = _static(default=(0.0, 0.0, 0.0))
    density: float = _static(default=0.0)
    viscosity: float = _static(default=0.0)


@struct.dataclass
class Model:
    """Compiled model. Array leaves device-resident; sizes/names static.

    Per-element arrays follow MuJoCo naming so the compiler can be validated
    against ``mujoco.MjModel`` (see tests/test_mjcf.py).
    """

    # ---- sizes (static) ----
    nq: int = _static()
    nv: int = _static()
    nu: int = _static()
    na: int = _static()
    nbody: int = _static()
    njnt: int = _static()
    ngeom: int = _static()
    nsite: int = _static()
    npair: int = _static()  # candidate contact pairs (compile-time static)
    ncon_max: int = _static()  # total contact points capacity
    nlimit: int = _static()  # number of potentially-limited dofs
    nkey: int = _static()
    nsensor: int = _static()
    nsensordata: int = _static()

    opt: Option = _static()

    # ---- qpos/dof bookkeeping (static numpy; used for indexing under jit) ----
    # kept as numpy arrays in aux data: they only ever index, never trace.
    jnt_type: Any = _static()        # (njnt,) JointType codes
    jnt_qposadr: Any = _static()     # (njnt,)
    jnt_dofadr: Any = _static()      # (njnt,)
    jnt_bodyid: Any = _static()      # (njnt,)
    jnt_limited: Any = _static()     # (njnt,) bool
    dof_bodyid: Any = _static()      # (nv,)
    dof_jntid: Any = _static()       # (nv,)
    body_parentid: Any = _static()   # (nbody,)
    body_rootid: Any = _static()     # (nbody,)
    body_jntadr: Any = _static()     # (nbody,)
    body_jntnum: Any = _static()     # (nbody,)
    body_dofadr: Any = _static()     # (nbody,)
    body_dofnum: Any = _static()     # (nbody,)
    body_treeid: Any = _static()     # (nbody,) depth level in kinematic tree
    geom_bodyid: Any = _static()     # (ngeom,)
    geom_type: Any = _static()       # (ngeom,)
    site_bodyid: Any = _static()     # (nsite,)
    site_type: Any = _static()       # (nsite,) GeomType codes
    sensor_type: Any = _static()     # (nsensor,) SensorType codes
    sensor_objid: Any = _static()    # (nsensor,) site or body id
    sensor_adr: Any = _static()      # (nsensor,) offset into sensordata
    sensor_dim: Any = _static()      # (nsensor,)
    actuator_trnid: Any = _static()  # (nu,) target joint id
    actuator_dyntype: Any = _static()
    actuator_gaintype: Any = _static()
    actuator_biastype: Any = _static()
    # candidate contact pairs, resolved at compile time:
    pair_geom1: Any = _static()      # (npair,)
    pair_geom2: Any = _static()      # (npair,)
    pair_dim: Any = _static()        # (npair,) condim
    # dof ancestry mask: madr[i, j] = 1 if dof j is an ancestor-or-self of i
    dof_ancestor_mask: Any = _static()  # (nv, nv) bool numpy
    # tree-accumulation masks: turn all kinematic-tree prefix/suffix sums
    # into single (batched) matmuls instead of level-by-level scatters
    body_subtree_mask: Any = _static()   # (nbody, nbody): c in subtree(b)
    body_chain_dof_mask: Any = _static() # (nbody, nv): dof in chain of b
    dof_prefix_mask: Any = _static()     # (nv, nv): dof j precedes dof i
                                         # (MuJoCo per-joint snapshot rule)
    # ---- names (static) ----
    body_names: Tuple[str, ...] = _static()
    joint_names: Tuple[str, ...] = _static()
    geom_names: Tuple[str, ...] = _static()
    site_names: Tuple[str, ...] = _static()
    actuator_names: Tuple[str, ...] = _static()
    sensor_names: Tuple[str, ...] = _static()
    key_names: Tuple[str, ...] = _static()

    # ---- array leaves (device) ----
    qpos0: jax.Array            # (nq,)
    qpos_spring: jax.Array      # (nq,)
    body_pos: jax.Array         # (nbody, 3)
    body_quat: jax.Array        # (nbody, 4)
    body_ipos: jax.Array        # (nbody, 3)
    body_iquat: jax.Array       # (nbody, 4)
    body_mass: jax.Array        # (nbody,)
    body_inertia: jax.Array     # (nbody, 3)
    body_subtreemass: jax.Array # (nbody,)
    jnt_pos: jax.Array          # (njnt, 3)
    jnt_axis: jax.Array         # (njnt, 3)
    jnt_range: jax.Array        # (njnt, 2)
    jnt_stiffness: jax.Array    # (njnt,)
    jnt_margin: jax.Array       # (njnt,)
    jnt_solref: jax.Array       # (njnt, 2) limit solref
    jnt_solimp: jax.Array       # (njnt, 5) limit solimp
    dof_armature: jax.Array     # (nv,)
    dof_damping: jax.Array      # (nv,)
    dof_frictionloss: jax.Array # (nv,)
    dof_invweight0: jax.Array   # (nv,) diag(M^-1) at qpos0
    body_invweight0: jax.Array  # (nbody,) translational inverse weight at qpos0
    geom_pos: jax.Array         # (ngeom, 3)
    geom_quat: jax.Array        # (ngeom, 4)
    geom_size: jax.Array        # (ngeom, 3)
    geom_friction: jax.Array    # (ngeom, 3)
    geom_solref: jax.Array      # (ngeom, 2)
    geom_solimp: jax.Array      # (ngeom, 5)
    geom_margin: jax.Array      # (ngeom,)
    geom_gap: jax.Array         # (ngeom,)
    geom_rbound: jax.Array      # (ngeom,) bounding sphere radius
    site_pos: jax.Array         # (nsite, 3)
    site_quat: jax.Array        # (nsite, 4)
    site_size: jax.Array        # (nsite, 3)
    actuator_gear: jax.Array    # (nu,)   (scalar joint gear)
    actuator_gainprm: jax.Array # (nu, 3)
    actuator_biasprm: jax.Array # (nu, 3)
    actuator_dynprm: jax.Array  # (nu, 1)
    actuator_ctrlrange: jax.Array   # (nu, 2)
    actuator_forcerange: jax.Array  # (nu, 2)
    actuator_ctrllimited: jax.Array # (nu,) bool
    actuator_forcelimited: jax.Array  # (nu,) bool
    actuator_actadr: jax.Array  # (nu,) index into act or -1  (int32 leaf ok)
    # per candidate pair, combined contact parameters:
    pair_friction: jax.Array    # (npair, 3) tangential, torsional, rolling
    pair_solref: jax.Array      # (npair, 2)
    pair_solimp: jax.Array      # (npair, 5)
    pair_margin: jax.Array      # (npair,)
    pair_gap: jax.Array         # (npair,)
    key_qpos: jax.Array         # (nkey, nq)

    # absolute path of the model's binary <skin> asset, if any (visual-only;
    # consumed by render/skin.py for skinned eval videos).  Last field: the
    # only one with a default (dataclass ordering).
    skin_file: Optional[str] = _static(default=None)

    def name2id(self, kind: str, name: str) -> int:
        table = {
            "body": self.body_names,
            "joint": self.joint_names,
            "geom": self.geom_names,
            "site": self.site_names,
            "actuator": self.actuator_names,
        }[kind]
        return table.index(name)


@struct.dataclass
class Data:
    """Dynamic per-instance state (all leaves are arrays; vmap over leading
    batch dims)."""

    # generalized state
    qpos: jax.Array             # (nq,)
    qvel: jax.Array             # (nv,)
    act: jax.Array              # (na,)
    ctrl: jax.Array             # (nu,)
    # computed by forward():
    xpos: jax.Array             # (nbody, 3) frame origin
    xquat: jax.Array            # (nbody, 4)
    xmat: jax.Array             # (nbody, 3, 3)
    xipos: jax.Array            # (nbody, 3) com position
    xanchor: jax.Array          # (njnt, 3)
    xaxis: jax.Array            # (njnt, 3)
    geom_xpos: jax.Array        # (ngeom, 3)
    geom_xmat: jax.Array        # (ngeom, 3, 3)
    subtree_com: jax.Array      # (nbody, 3)
    cinert: jax.Array           # (nbody, 6, 6) com-frame spatial inertia
    cdof: jax.Array             # (nv, 6) com-frame motion axes
    cvel: jax.Array             # (nbody, 6) com-frame body velocity
    qM: jax.Array               # (nv, nv) dense mass matrix
    qMinv: jax.Array            # (nv, nv) inverse mass matrix
    qMhBinv: jax.Array          # (nv, nv) (M + h*diag(damping))^-1 for implicit Euler
    qfrc_bias: jax.Array        # (nv,)
    qfrc_passive: jax.Array     # (nv,)
    qfrc_actuator: jax.Array    # (nv,)
    actuator_force: jax.Array   # (nu,)
    act_dot: jax.Array          # (na,)
    qfrc_smooth: jax.Array      # (nv,)
    qacc_smooth: jax.Array      # (nv,)
    qfrc_constraint: jax.Array  # (nv,)
    qacc: jax.Array             # (nv,)
    # contact diagnostics (per candidate contact point, padded/masked):
    contact_dist: jax.Array     # (ncon_max,)
    contact_pos: jax.Array      # (ncon_max, 3)
    contact_frame: jax.Array    # (ncon_max, 3, 3) rows: normal, tan1, tan2
    contact_force: jax.Array    # (ncon_max, 4) pyramidal-basis forces (diag)
    sensordata: jax.Array       # (nsensordata,)

    @property
    def q(self) -> jax.Array:  # alias used by reference envs (rodent.py:314)
        return self.qpos
