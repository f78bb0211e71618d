"""PPO surrogate + value + entropy + intention-KL loss.

Behavioral spec from /root/reference/ppo_imitation/intention_losses.py:
TD(lambda) targets via a reverse scan (ref :26-87), clipped importance
surrogate (ref :171-178), value loss weighted 0.25 (ref :181-182), entropy
bonus, and the VAE regularizer KL(posterior || N(0,1)) scaled by kl_weight
(ref :187; "MIMIC" weighting, kl_weight 1e-4 per ppo_imitation/train.py:95).

The GAE here is a single fused reverse scan that emits both the value
targets and the advantages in one pass (the reference recomputes the
advantage from the shifted targets afterwards; algebraically identical:
adv_t = mask_t * (delta_t + c_t * gae_{t+1}) where c_t is the discount
continuation and gae is the lambda-weighted tail).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from vnl_tpu.training.types import Metrics, Transition


@struct.dataclass
class PPONetworkParams:
    policy: Any
    value: Any


def kl_divergence(mean, logvar):
    """Mean elementwise KL(N(mean, exp(logvar)) || N(0, 1))."""
    var = jnp.exp(logvar)
    return 0.5 * jnp.mean(jnp.square(mean) + var - logvar - 1.0)


def compute_gae(truncation, termination, rewards, values, bootstrap_value,
                lambda_: float = 1.0, discount: float = 0.99):
    """TD(lambda) value targets + advantages over [T, B] tensors.

    Equivalent to the reference formulation (intention_losses.py:26-87):
    truncated steps contribute nothing (mask), terminated steps cut the
    discounted continuation.  Returns (targets, advantages), both with
    gradients stopped.
    """
    mask = 1.0 - truncation
    cont = discount * (1.0 - termination)  # discounted continuation weight
    next_values = jnp.concatenate([values[1:], bootstrap_value[None]], axis=0)
    deltas = rewards + cont * next_values - values  # one-step TD residuals

    def tail(gae, frame):
        delta_t, cont_t, mask_t = frame
        advantage = mask_t * (delta_t + cont_t * gae)
        gae = mask_t * (delta_t + lambda_ * cont_t * gae)
        return gae, (gae, advantage)

    _, (lambda_returns, advantages) = jax.lax.scan(
        tail, jnp.zeros_like(bootstrap_value), (deltas, cont, mask),
        reverse=True)
    targets = lambda_returns + values
    return jax.lax.stop_gradient(targets), jax.lax.stop_gradient(advantages)


def compute_ppo_intention_loss(
    params: PPONetworkParams,
    normalizer_params: Any,
    data: Transition,
    rng: jax.Array,
    ppo_network,
    entropy_cost: float = 1e-4,
    discounting: float = 0.9,
    reward_scaling: float = 1.0,
    gae_lambda: float = 0.95,
    clipping_epsilon: float = 0.3,
    normalize_advantage: bool = True,
    kl_weight: float = 1e-4,
) -> Tuple[jax.Array, Metrics]:
    """Total loss + metrics for one minibatch (ref intention_losses.py:91-202).

    data carries [B, T] leading dims; needs extras.state_extras.{truncation,
    traj} and extras.policy_extras.{raw_action, log_prob}.
    """
    dist = ppo_network.parametric_action_distribution

    # time-major views of everything the loss touches
    tm = lambda x: jnp.swapaxes(x, 0, 1)
    obs = tm(data.observation)
    traj = tm(data.extras["state_extras"]["traj"])
    truncation = tm(data.extras["state_extras"]["truncation"])
    behaviour_raw = tm(data.extras["policy_extras"]["raw_action"])
    behaviour_logp = tm(data.extras["policy_extras"]["log_prob"])
    rewards = tm(data.reward) * reward_scaling
    # discount==0 and not truncated <=> environment termination
    termination = (1.0 - tm(data.discount)) * (1.0 - truncation)

    # fresh latent sample per update (ref :133-139)
    rng, net_rng, entropy_rng = jax.random.split(rng, 3)
    dist_params, post_mean, post_logvar = ppo_network.policy_network.apply(
        normalizer_params, params.policy, traj, obs, net_rng)
    values = ppo_network.value_network.apply(
        normalizer_params, params.value, obs)
    tail_value = ppo_network.value_network.apply(
        normalizer_params, params.value, tm(data.next_observation)[-1])

    targets, advantages = compute_gae(
        truncation=truncation, termination=termination, rewards=rewards,
        values=values, bootstrap_value=tail_value,
        lambda_=gae_lambda, discount=discounting)
    if normalize_advantage:
        advantages = ((advantages - advantages.mean())
                      / (advantages.std() + 1e-8))

    log_ratio = dist.log_prob(dist_params, behaviour_raw) - behaviour_logp
    ratio = jnp.exp(log_ratio)
    clipped_ratio = jnp.clip(ratio, 1.0 - clipping_epsilon,
                             1.0 + clipping_epsilon)
    surrogate = -jnp.mean(
        jnp.minimum(ratio * advantages, clipped_ratio * advantages))

    value_error = targets - values
    value_loss = 0.25 * jnp.mean(jnp.square(value_error))

    entropy_bonus = -entropy_cost * jnp.mean(
        dist.entropy(dist_params, entropy_rng))
    posterior_kl = kl_weight * kl_divergence(post_mean, post_logvar)

    total = surrogate + value_loss + entropy_bonus + posterior_kl
    return total, {
        "total_loss": total,
        "policy_loss": surrogate,
        "v_loss": value_loss,
        "entropy_loss": entropy_bonus,
        "kl_loss_intention": posterior_kl,
        "prediction_corr": jnp.corrcoef(targets.ravel(),
                                        rewards.ravel())[0, 1],
        "explained_variance": 1.0 - value_loss / jnp.var(rewards),
    }
