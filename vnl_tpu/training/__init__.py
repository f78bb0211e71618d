"""Intention-PPO training stack.

Covers the reference's forked-brax trainer layer (/root/reference/
ppo_imitation/: train.py, acting.py, intention_losses.py) plus the brax
training utilities it imports (gradients, running_statistics, pmap helpers)
— redesigned TPU-first: the epoch is one donated jitted program under
shard_map over an explicit device Mesh instead of pmap.
"""

from vnl_tpu.training.types import Transition
from vnl_tpu.training import running_statistics
from vnl_tpu.training.losses import (
    PPONetworkParams,
    compute_gae,
    compute_ppo_intention_loss,
    kl_divergence,
)
from vnl_tpu.training.acting import Evaluator, actor_step, generate_unroll
from vnl_tpu.training.train import train
