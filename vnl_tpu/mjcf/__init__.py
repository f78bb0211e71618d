"""First-party MJCF compiler: XML -> frozen JAX model pytree.

Replaces the reference's third-party compile path (MuJoCo C compiler via
dm_control + ``brax.io.mjcf.load_model`` + ``mjx.put_model``, cf.
/root/reference/envs/rodent.py:39-95) with a pure-Python compiler that emits
:class:`vnl_tpu.physics.Model` directly.  Model-editing steps the reference
performs at runtime through dm_control — geometric subtree rescale and
position->torque actuator conversion (/root/reference/envs/rodent.py:42-52)
— are compile-time spec transforms here.
"""

from vnl_tpu.mjcf.parser import parse, MjcfElement, MjcfSpec
from vnl_tpu.mjcf.compiler import compile_spec, load_model
from vnl_tpu.mjcf.transforms import rescale_subtree, to_torque_actuators
