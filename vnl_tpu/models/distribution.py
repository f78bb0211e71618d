"""Parametric action distributions (brax.training.distribution semantics).

NormalTanhDistribution: diagonal Gaussian with softplus std, squashed by
tanh.  Used by the reference at ppo_networks.py:102; log_prob/entropy follow
the standard tanh-bijector change of variables with the numerically-stable
log-det 2*(log2 - x - softplus(-2x)).
"""

from __future__ import annotations

import abc

import jax
import jax.numpy as jnp


class ParametricDistribution(abc.ABC):
    """Distribution over actions parameterized by network output 'logits'."""

    def __init__(self, param_size: int, event_size: int):
        self._param_size = param_size
        self._event_size = event_size

    @property
    def param_size(self) -> int:
        return self._param_size

    @property
    def event_size(self) -> int:
        return self._event_size

    @abc.abstractmethod
    def sample_no_postprocessing(self, logits, seed):
        ...

    @abc.abstractmethod
    def postprocess(self, raw_action):
        ...

    @abc.abstractmethod
    def log_prob(self, logits, raw_action):
        ...

    @abc.abstractmethod
    def entropy(self, logits, seed):
        ...

    @abc.abstractmethod
    def mode(self, logits):
        ...

    def sample(self, logits, seed):
        return self.postprocess(self.sample_no_postprocessing(logits, seed))


def _tanh_log_det(x):
    # log |d tanh(x)/dx| = log(1 - tanh(x)^2), stable form
    return 2.0 * (jnp.log(2.0) - x - jax.nn.softplus(-2.0 * x))


class NormalTanhDistribution(ParametricDistribution):
    """tanh(Normal(loc, softplus(scale) + min_std))."""

    def __init__(self, event_size: int, min_std: float = 0.001,
                 var_scale: float = 1.0):
        super().__init__(param_size=2 * event_size, event_size=event_size)
        self._min_std = min_std
        self._var_scale = var_scale

    def _loc_scale(self, logits):
        loc, scale = jnp.split(logits, 2, axis=-1)
        scale = (jax.nn.softplus(scale) + self._min_std) * self._var_scale
        return loc, scale

    def sample_no_postprocessing(self, logits, seed):
        loc, scale = self._loc_scale(logits)
        return loc + scale * jax.random.normal(seed, loc.shape, loc.dtype)

    def postprocess(self, raw_action):
        return jnp.tanh(raw_action)

    def log_prob(self, logits, raw_action):
        loc, scale = self._loc_scale(logits)
        log_normal = (-0.5 * jnp.square((raw_action - loc) / scale)
                      - 0.5 * jnp.log(2.0 * jnp.pi) - jnp.log(scale))
        return jnp.sum(log_normal - _tanh_log_det(raw_action), axis=-1)

    def entropy(self, logits, seed):
        loc, scale = self._loc_scale(logits)
        normal_entropy = 0.5 + 0.5 * jnp.log(2.0 * jnp.pi) + jnp.log(scale)
        sample = loc + scale * jax.random.normal(seed, loc.shape, loc.dtype)
        return jnp.sum(normal_entropy + _tanh_log_det(sample), axis=-1)

    def mode(self, logits):
        loc, _ = self._loc_scale(logits)
        return jnp.tanh(loc)
