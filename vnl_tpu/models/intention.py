"""Latent-intention actor network (CoMic / Hasenclever-2020 lineage).

Behavioral spec from the reference implementation
(/root/reference/ppo_imitation/intention_policy_network.py): a trajectory
encoder compresses the 5-frame reference-feature window into a Gaussian
posterior over a latent "intention"; one sample of that latent, concatenated
with the proprioceptive observation, drives a decoder that emits action
distribution parameters.  Every hidden layer is Dense -> relu -> LayerNorm
(ref :40-44, :67-69); the final decoder layer is a bare affine head.  The
observation runs through the running-statistics normalizer while the
trajectory features deliberately do not (ref :125-127).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vnl_tpu.models import networks
from vnl_tpu.models.networks import FeedForwardNetwork


class _NormedStack(nn.Module):
    """Dense -> relu -> LayerNorm, repeated; the workhorse of both halves."""

    widths: Sequence[int]

    @nn.compact
    def __call__(self, h: jax.Array) -> jax.Array:
        for k, width in enumerate(self.widths):
            h = nn.LayerNorm(name=f"norm_{k}")(
                nn.relu(nn.Dense(width, name=f"proj_{k}")(h)))
        return h


class IntentionPolicy(nn.Module):
    """traj window + obs + rng -> (dist params, posterior mean, posterior logvar)."""

    encoder_widths: Sequence[int]
    decoder_widths: Sequence[int]
    latent_width: int
    out_width: int

    @nn.compact
    def __call__(self, traj: jax.Array, obs: jax.Array,
                 rng: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
        h = _NormedStack(self.encoder_widths, name="encoder")(traj)
        post_mean = nn.Dense(self.latent_width, name="post_mean")(h)
        post_logvar = nn.Dense(self.latent_width, name="post_logvar")(h)
        # one reparameterized draw from N(mean, exp(logvar))
        noise = jax.random.normal(rng, post_mean.shape, post_mean.dtype)
        intention = post_mean + noise * jnp.exp(0.5 * post_logvar)

        g = jnp.concatenate([intention, obs], axis=-1)
        g = _NormedStack(self.decoder_widths, name="decoder")(g)
        dist_params = nn.Dense(self.out_width, name="action_head")(g)
        return dist_params, post_mean, post_logvar


def make_intention_policy(
    param_size: int,
    latent_size: int,
    obs_size: int,
    traj_size: int,
    preprocess_observations_fn=networks.identity_observation_preprocessor,
    encoder_layer_sizes: Sequence[int] = (1024, 1024),
    decoder_layer_sizes: Sequence[int] = (1024, 1024),
) -> FeedForwardNetwork:
    """Wraps IntentionPolicy as an (init, apply) pair.

    apply(normalizer_params, params, traj, obs, rng): obs is normalized with
    the running statistics; traj is consumed raw (ref :125-127).
    """
    module = IntentionPolicy(
        encoder_widths=tuple(encoder_layer_sizes),
        decoder_widths=tuple(decoder_layer_sizes),
        latent_width=latent_size,
        out_width=param_size,
    )

    def init(rng: jax.Array):
        return module.init(
            rng,
            jnp.zeros((1, traj_size)),
            jnp.zeros((1, obs_size)),
            jax.random.PRNGKey(0),
        )

    def apply(normalizer_params, params, traj, obs, rng):
        return module.apply(
            params, traj,
            preprocess_observations_fn(obs, normalizer_params), rng)

    return FeedForwardNetwork(init=init, apply=apply)
