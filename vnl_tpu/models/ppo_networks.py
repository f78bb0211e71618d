"""PPO network bundle + inference function.

Re-implements /root/reference/ppo_imitation/ppo_networks.py: the policy
returns (action, extras) where extras carries log_prob, the uniform-action
diagnostic rand_log_prob (:68-73), raw_action and logits for the PPO loss.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from vnl_tpu.models import networks
from vnl_tpu.models.distribution import NormalTanhDistribution, ParametricDistribution
from vnl_tpu.models.intention import make_intention_policy
from vnl_tpu.models.networks import FeedForwardNetwork


@struct.dataclass
class PPOImitationNetworks:
    policy_network: FeedForwardNetwork = struct.field(pytree_node=False)
    value_network: FeedForwardNetwork = struct.field(pytree_node=False)
    parametric_action_distribution: ParametricDistribution = struct.field(
        pytree_node=False)


def make_inference_fn(ppo_networks: PPOImitationNetworks):
    """Creates the policy factory (ppo_networks.py:35-87)."""

    def make_policy(params, deterministic: bool = False):
        policy_network = ppo_networks.policy_network
        parametric_action_distribution = (
            ppo_networks.parametric_action_distribution)

        def policy(trajectories, observations, key_sample):
            key_sample, key_network = jax.random.split(key_sample)
            logits, _, _ = policy_network.apply(
                *params, trajectories, observations, key_network)
            if deterministic:
                return parametric_action_distribution.mode(logits), {}
            raw_actions = parametric_action_distribution.sample_no_postprocessing(
                logits, key_sample)
            log_prob = parametric_action_distribution.log_prob(
                logits, raw_actions)
            action_size = logits.shape[-1] // 2
            random_actions = jax.random.uniform(
                key_sample, shape=(action_size,), minval=-1.0, maxval=1.0)
            rand_log_prob = parametric_action_distribution.log_prob(
                logits, random_actions)
            postprocessed_actions = parametric_action_distribution.postprocess(
                raw_actions)
            return postprocessed_actions, {
                "log_prob": log_prob,
                "rand_log_prob": rand_log_prob,
                "raw_action": raw_actions,
                "logits": logits,
            }

        return policy

    return make_policy


def make_intention_ppo_networks(
    traj_size: int,
    observation_size: int,
    action_size: int,
    preprocess_observations_fn=networks.identity_observation_preprocessor,
    intention_latent_size: int = 64,
    encoder_layer_sizes: Sequence[int] = (1024,) * 2,
    decoder_layer_sizes: Sequence[int] = (1024,) * 2,
    value_hidden_layer_sizes: Sequence[int] = (1024,) * 2,
) -> PPOImitationNetworks:
    """Bundles intention policy + value net + tanh-normal distribution
    (ppo_networks.py:91-124)."""
    parametric_action_distribution = NormalTanhDistribution(
        event_size=action_size)
    policy_network = make_intention_policy(
        parametric_action_distribution.param_size,
        latent_size=intention_latent_size,
        traj_size=traj_size,
        obs_size=observation_size,
        preprocess_observations_fn=preprocess_observations_fn,
        encoder_layer_sizes=encoder_layer_sizes,
        decoder_layer_sizes=decoder_layer_sizes,
    )
    value_network = networks.make_value_network(
        observation_size,
        preprocess_observations_fn=preprocess_observations_fn,
        hidden_layer_sizes=value_hidden_layer_sizes,
    )
    return PPOImitationNetworks(
        policy_network=policy_network,
        value_network=value_network,
        parametric_action_distribution=parametric_action_distribution,
    )
