"""Intention (VAE) policy network — CoMic/Hasenclever lineage.

Re-implements /root/reference/ppo_imitation/intention_policy_network.py:
an encoder maps the reference-trajectory feature window to a stochastic
latent "intention"; a decoder maps (latent ++ proprioceptive obs) to action
distribution parameters.  LayerNorm after every hidden activation, matching
the reference (:40-44, :67-69).  Note the reference normalizes obs but NOT
traj (:125-127) — preserved here.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vnl_tpu.models import networks
from vnl_tpu.models.networks import ActivationFn, FeedForwardNetwork, Initializer


class Encoder(nn.Module):
    """traj features -> (mean, logvar) of the intention latent."""

    layer_sizes: Sequence[int]
    latents: int
    activation: ActivationFn = nn.relu
    kernel_init: Initializer = jax.nn.initializers.lecun_uniform()
    bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        for i, hidden_size in enumerate(self.layer_sizes):
            x = nn.Dense(hidden_size, name=f"hidden_{i}",
                         kernel_init=self.kernel_init, use_bias=self.bias)(x)
            x = self.activation(x)
            x = nn.LayerNorm()(x)
        mean_x = nn.Dense(self.latents, name="fc2_mean")(x)
        logvar_x = nn.Dense(self.latents, name="fc2_logvar")(x)
        return mean_x, logvar_x


class Decoder(nn.Module):
    """(latent ++ obs) -> action distribution parameters."""

    layer_sizes: Sequence[int]
    activation: ActivationFn = nn.relu
    kernel_init: Initializer = jax.nn.initializers.lecun_uniform()
    activate_final: bool = False
    bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i, hidden_size in enumerate(self.layer_sizes):
            x = nn.Dense(hidden_size, name=f"hidden_{i}",
                         kernel_init=self.kernel_init, use_bias=self.bias)(x)
            if i != len(self.layer_sizes) - 1 or self.activate_final:
                x = self.activation(x)
                x = nn.LayerNorm()(x)
        return x


def reparameterize(rng, mean, logvar):
    std = jnp.exp(0.5 * logvar)
    eps = jax.random.normal(rng, logvar.shape, mean.dtype)
    return mean + eps * std


class IntentionNetwork(nn.Module):
    """encoder -> reparameterized latent -> decoder."""

    encoder_layers: Sequence[int]
    decoder_layers: Sequence[int]
    latents: int = 60

    def setup(self):
        self.encoder = Encoder(layer_sizes=self.encoder_layers,
                               latents=self.latents)
        self.decoder = Decoder(layer_sizes=self.decoder_layers)

    def __call__(self, traj, obs, key):
        _, encoder_rng = jax.random.split(key, 2)
        intention_mean, intention_logvar = self.encoder(traj)
        z = reparameterize(encoder_rng, intention_mean, intention_logvar)
        action = self.decoder(jnp.concatenate([z, obs], axis=-1))
        return action, intention_mean, intention_logvar


def make_intention_policy(
    param_size: int,
    latent_size: int,
    obs_size: int,
    traj_size: int,
    preprocess_observations_fn=networks.identity_observation_preprocessor,
    encoder_layer_sizes: Sequence[int] = (1024, 1024),
    decoder_layer_sizes: Sequence[int] = (1024, 1024),
) -> FeedForwardNetwork:
    """Creates the intention policy (intention_policy_network.py:108-136)."""
    policy_module = IntentionNetwork(
        encoder_layers=list(encoder_layer_sizes),
        decoder_layers=list(decoder_layer_sizes) + [param_size],
        latents=latent_size,
    )

    def apply(processor_params, policy_params, traj, obs, key):
        obs = preprocess_observations_fn(obs, processor_params)
        return policy_module.apply(policy_params, traj=traj, obs=obs, key=key)

    dummy_obs = jnp.zeros((1, obs_size))
    dummy_traj = jnp.zeros((1, traj_size))
    dummy_key = jax.random.PRNGKey(0)
    return FeedForwardNetwork(
        init=lambda key: policy_module.init(key, dummy_traj, dummy_obs,
                                            dummy_key),
        apply=apply)
