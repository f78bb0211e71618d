"""Environment framework: State/Env base, training wrappers, registry.

Provides the capability surface the reference gets from brax.envs
(PipelineEnv/State, envs.training.wrap, EvalWrapper — cf.
/root/reference/envs/rodent.py:5, /root/reference/ppo_imitation/
train.py:205-218, acting.py:109) plus the tracking environments themselves.
"""

from vnl_tpu.envs.base import Env, PipelineEnv, State
from vnl_tpu.envs.wrappers import (
    AutoResetWrapper,
    EpisodeWrapper,
    EvalWrapper,
    VmapWrapper,
    Wrapper,
    wrap_for_training,
)
from vnl_tpu.envs.registry import get_environment, register_environment

# register built-in environments
from vnl_tpu.envs import ant as _ant  # noqa: F401
from vnl_tpu.envs import humanoid as _humanoid  # noqa: F401
from vnl_tpu.envs import rodent as _rodent  # noqa: F401
