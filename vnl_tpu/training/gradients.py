"""Gradient transformations with cross-device reduction.

brax.training.gradients equivalent (reference wiring at
ppo_imitation/train.py:251-253): value_and_grad + optax update with the
gradients pmean-ed over the data-parallel mesh axis — the DP allreduce that
XLA lowers onto ICI/DCN collectives.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import optax


def loss_and_pgrad(loss_fn: Callable, axis_name: Optional[str],
                   has_aux: bool = False):
    g = jax.value_and_grad(loss_fn, has_aux=has_aux)

    def h(*args, **kwargs):
        value, grad = g(*args, **kwargs)
        if axis_name is not None:
            grad = jax.lax.pmean(grad, axis_name=axis_name)
        return value, grad

    return g if axis_name is None else h


def gradient_update_fn(loss_fn: Callable, optimizer: optax.GradientTransformation,
                       axis_name: Optional[str] = None,
                       pmap_axis_name: Optional[str] = None,
                       has_aux: bool = False):
    """Returns f(*args, optimizer_state) -> (loss, new_params, new_opt_state)."""
    axis_name = axis_name or pmap_axis_name
    loss_and_pgrad_fn = loss_and_pgrad(loss_fn, axis_name=axis_name,
                                       has_aux=has_aux)

    def f(*args, optimizer_state):
        value, grads = loss_and_pgrad_fn(*args)
        params_update, optimizer_state = optimizer.update(
            grads, optimizer_state, params=args[0])
        params = optax.apply_updates(args[0], params_update)
        return value, params, optimizer_state

    return f
