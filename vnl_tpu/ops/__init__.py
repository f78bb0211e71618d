"""TPU-optimized compute kernels for the physics hot path."""

from vnl_tpu.ops.linalg import inv_spd
