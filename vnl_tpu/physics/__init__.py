"""Batched TPU-native rigid-body physics engine (MJX-class capability).

Covers what the reference stack gets from ``mujoco.mjx``
(/root/reference/envs/rodent.py:100, /root/reference/preprocessing/
mjx_preprocess.py:85-147): forward kinematics, CoM-frame inertias, composite
rigid body mass matrix, recursive Newton-Euler bias forces, joint
springs/dampers, general/filter actuation, pyramidal-cone contact and
joint-limit constraints with CG and Newton solvers, and semi-implicit Euler
integration — all as pure jax functions over static-shape pytrees, designed
to be ``vmap``-ed over thousands of env instances and compiled into one XLA
program per training epoch.
"""

from vnl_tpu.physics.model import (
    Data,
    Model,
    DisableBit,
    GeomType,
    JointType,
    DynType,
    GainType,
    BiasType,
    ConeType,
    SolverType,
    IntegratorType,
)
from vnl_tpu.physics.forward import forward, make_data, step
from vnl_tpu.physics.kinematics import kinematics
