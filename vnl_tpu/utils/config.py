"""YAML config with dotted-path CLI overrides (hydra-equivalent surface).

The reference composes two hydra YAML groups (train_config + env_config,
/root/reference/train.py:71-76).  Here: plain YAML files plus
``key.subkey=value`` overrides, no global framework state.
"""

from __future__ import annotations

import ast
from typing import Any, Dict, List

import yaml


def load_config(*paths: str) -> Dict[str, Any]:
    """Loads and shallow-merges YAML files (later wins)."""
    cfg: Dict[str, Any] = {}
    for p in paths:
        with open(p) as f:
            loaded = yaml.safe_load(f) or {}
        for k, v in loaded.items():
            if isinstance(v, dict) and isinstance(cfg.get(k), dict):
                cfg[k].update(v)
            else:
                cfg[k] = v
    return cfg


def _parse_value(s: str) -> Any:
    try:
        return ast.literal_eval(s)
    except (ValueError, SyntaxError):
        return s


def apply_overrides(cfg: Dict[str, Any], overrides: List[str]) -> Dict[str, Any]:
    """Applies 'a.b.c=value' style overrides in place."""
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"override must be key=value, got {ov!r}")
        key, value = ov.split("=", 1)
        node = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = _parse_value(value)
    return cfg
