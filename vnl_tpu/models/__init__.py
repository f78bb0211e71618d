"""Networks and action distributions for the intention-PPO stack.

Covers what the reference takes from brax.training (distribution, networks,
MLP, make_value_network) plus its own intention policy modules
(/root/reference/ppo_imitation/intention_policy_network.py,
ppo_networks.py).
"""

from vnl_tpu.models.distribution import NormalTanhDistribution, ParametricDistribution
from vnl_tpu.models.networks import (
    FeedForwardNetwork,
    MLP,
    make_value_network,
)
from vnl_tpu.models.intention import (
    IntentionPolicy,
    make_intention_policy,
)
from vnl_tpu.models.ppo_networks import (
    PPOImitationNetworks,
    make_inference_fn,
    make_intention_ppo_networks,
)
