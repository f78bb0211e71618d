"""Training pytree types (brax.training.types equivalents)."""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax

Params = Any
PRNGKey = jax.Array
Metrics = Dict[str, jax.Array]


class Transition(NamedTuple):
    """One env transition with nested extras
    (brax.training.types.Transition; packed at acting.py:50-57)."""

    observation: jax.Array
    action: jax.Array
    reward: jax.Array
    discount: jax.Array
    next_observation: jax.Array
    extras: Dict[str, Any] = {}
