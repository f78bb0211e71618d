"""Basic network building blocks (brax.training.networks equivalents).

bf16-friendly: Dense layers compute in the input dtype; params stay fp32.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

ActivationFn = Callable[[jax.Array], jax.Array]
Initializer = Any


@dataclasses.dataclass
class FeedForwardNetwork:
    init: Callable[..., Any]
    apply: Callable[..., Any]


class MLP(nn.Module):
    """Plain MLP (brax.training.networks.MLP)."""

    layer_sizes: Sequence[int]
    activation: ActivationFn = nn.relu
    kernel_init: Initializer = jax.nn.initializers.lecun_uniform()
    activate_final: bool = False
    bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i, size in enumerate(self.layer_sizes):
            x = nn.Dense(size, name=f"hidden_{i}",
                         kernel_init=self.kernel_init, use_bias=self.bias)(x)
            if i != len(self.layer_sizes) - 1 or self.activate_final:
                x = self.activation(x)
        return x


def identity_observation_preprocessor(obs, params):
    del params
    return obs


def make_value_network(
    obs_size: int,
    preprocess_observations_fn=identity_observation_preprocessor,
    hidden_layer_sizes: Sequence[int] = (1024, 1024),
    activation: ActivationFn = nn.relu,
) -> FeedForwardNetwork:
    """Value MLP with scalar squeeze (brax make_value_network;
    reference wires it at ppo_networks.py:114-118)."""
    value_module = MLP(layer_sizes=list(hidden_layer_sizes) + [1],
                       activation=activation)

    def apply(processor_params, params, obs):
        obs = preprocess_observations_fn(obs, processor_params)
        return jnp.squeeze(value_module.apply(params, obs), axis=-1)

    dummy_obs = jnp.zeros((1, obs_size))
    return FeedForwardNetwork(
        init=lambda key: value_module.init(key, dummy_obs), apply=apply)
