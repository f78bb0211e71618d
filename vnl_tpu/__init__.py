"""vnl_tpu: a TPU-native mocap-imitation RL framework.

Re-implements, from scratch and TPU-first, the full capability surface of
talmolab/VNL-Brax-Imitation (single/multi-clip motion-capture imitation for a
virtual rodent / humanoid / ant with an intention-network PPO learner):

- ``vnl_tpu.math``      quaternion / spatial algebra (MuJoCo conventions)
- ``vnl_tpu.mjcf``      first-party MJCF compiler -> frozen JAX model pytree
- ``vnl_tpu.physics``   batched rigid-body physics engine (FK, CRB, RNE,
                        pyramidal contacts, CG/Newton solvers) fully under
                        jit/vmap, fp32, static shapes
- ``vnl_tpu.envs``      Env/State framework, wrappers, tracking environments
- ``vnl_tpu.data``      mocap ReferenceClip pipeline + multi-clip library
- ``vnl_tpu.models``    intention (VAE) policy, value net, tanh-normal dist
- ``vnl_tpu.training``  PPO learner: one donated jitted epoch under shard_map
- ``vnl_tpu.parallel``  mesh/collective utilities for ICI/DCN scale-out
- ``vnl_tpu.ops``       pallas TPU kernels for hot paths
"""

__version__ = "0.1.0"
