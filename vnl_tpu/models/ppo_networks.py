"""Agent network bundle and policy construction for intention-PPO.

Behavioral spec from /root/reference/ppo_imitation/ppo_networks.py: the
sampled policy returns the tanh-postprocessed action together with the
extras the PPO loss and diagnostics need — the behaviour log-prob, the
pre-tanh action, the raw distribution parameters, and "rand_log_prob", the
log-probability the current distribution assigns to a uniformly drawn
action (ref :68-73; a collapse diagnostic plotted by the eval callback).
"""

from __future__ import annotations

from typing import Sequence

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
    """Returns make_policy(params, deterministic) -> policy(traj, obs, rng)."""
    dist = ppo_networks.parametric_action_distribution
    apply_net = ppo_networks.policy_network.apply

    def make_policy(params, deterministic: bool = False):

        def mode_policy(traj, obs, rng):
            _, net_rng = jax.random.split(rng)
            dist_params, _, _ = apply_net(*params, traj, obs, net_rng)
            return dist.mode(dist_params), {}

        def sampling_policy(traj, obs, rng):
            draw_rng, net_rng = jax.random.split(rng)
            dist_params, _, _ = apply_net(*params, traj, obs, net_rng)
            pre_tanh = dist.sample_no_postprocessing(dist_params, draw_rng)
            # diagnostic: likelihood of a uniform action under the current
            # distribution, for detecting distribution collapse
            n_act = dist_params.shape[-1] // 2
            uniform = jax.random.uniform(draw_rng, (n_act,), minval=-1.0,
                                         maxval=1.0)
            extras = {
                "log_prob": dist.log_prob(dist_params, pre_tanh),
                "rand_log_prob": dist.log_prob(dist_params, uniform),
                "raw_action": pre_tanh,
                "logits": dist_params,
            }
            return dist.postprocess(pre_tanh), extras

        return mode_policy if deterministic else sampling_policy

    return make_policy


def make_intention_ppo_networks(
    traj_size: int,
    observation_size: int,
    action_size: int,
    preprocess_observations_fn=networks.identity_observation_preprocessor,
    intention_latent_size: int = 64,
    encoder_layer_sizes: Sequence[int] = (1024, 1024),
    decoder_layer_sizes: Sequence[int] = (1024, 1024),
    value_hidden_layer_sizes: Sequence[int] = (1024, 1024),
) -> PPOImitationNetworks:
    """Assembles actor (intention policy), critic and the tanh-Gaussian
    action distribution (ref ppo_networks.py:91-124; value hidden sizes
    (1024, 1024) per :114-118)."""
    dist = NormalTanhDistribution(event_size=action_size)
    return PPOImitationNetworks(
        policy_network=make_intention_policy(
            dist.param_size,
            latent_size=intention_latent_size,
            obs_size=observation_size,
            traj_size=traj_size,
            preprocess_observations_fn=preprocess_observations_fn,
            encoder_layer_sizes=encoder_layer_sizes,
            decoder_layer_sizes=decoder_layer_sizes,
        ),
        value_network=networks.make_value_network(
            observation_size,
            preprocess_observations_fn=preprocess_observations_fn,
            hidden_layer_sizes=value_hidden_layer_sizes,
        ),
        parametric_action_distribution=dist,
    )
