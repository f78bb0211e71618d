"""Environment registry (reference: envs registered by name, train.py:65-68)."""

from __future__ import annotations

from typing import Callable, Dict

from vnl_tpu.envs.base import Env

_REGISTRY: Dict[str, Callable[..., Env]] = {}


def register_environment(name: str, ctor: Callable[..., Env]) -> None:
    _REGISTRY[name] = ctor


def get_environment(name: str, **kwargs) -> Env:
    if name not in _REGISTRY:
        raise KeyError(f"unknown environment {name!r}; "
                       f"registered: {sorted(_REGISTRY)}")
    return _REGISTRY[name](**kwargs)
