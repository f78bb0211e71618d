"""Full-state checkpointing with resume.

Upgrade over the reference, which saves only (normalizer_params, policy
params) and has no resume path (SURVEY.md §5.4, /root/reference/
train.py:137-156): the entire TrainingState (params + optimizer state +
normalizer + env_steps) round-trips through Orbax, so training can restart
from a preemption without losing Adam moments or observation statistics.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
from flax import serialization

try:
    import orbax.checkpoint as ocp
    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False


def save(checkpoint_dir: str, step: int, training_state: Any) -> str:
    """Saves the full TrainingState; returns the checkpoint path."""
    path = os.path.join(os.path.abspath(checkpoint_dir), str(step))
    host_state = jax.device_get(training_state)
    if _HAS_ORBAX:
        ckpt = ocp.StandardCheckpointer()
        ckpt.save(path, host_state, force=True)
        ckpt.wait_until_finished()
    else:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path + ".msgpack", "wb") as f:
            f.write(serialization.to_bytes(host_state))
    return path


_pending_save: "threading.Thread | None" = None


def save_async(checkpoint_dir: str, step: int, host_state: Any) -> None:
    """Writes a checkpoint on a background thread so the trainer overlaps
    the disk write with the next training interval.  ``host_state`` MUST
    already be host-resident (``jax.device_get``) — the caller owns the
    device buffers and may donate them while the write is in flight.  At
    most one save is in flight; a new save joins the previous one first
    (writes stay ordered, memory stays bounded)."""
    global _pending_save
    import threading

    if _pending_save is not None:
        _pending_save.join()

    def _write():
        try:
            save(checkpoint_dir, step, host_state)
        except Exception:  # pragma: no cover - surfaced via logs, not raise
            import logging
            import traceback
            logging.error("async checkpoint save at step %s failed:\n%s",
                          step, traceback.format_exc())

    _pending_save = threading.Thread(target=_write, daemon=True,
                                     name=f"ckpt-save-{step}")
    _pending_save.start()


def wait_for_pending_saves() -> None:
    """Joins any in-flight async checkpoint write (call before exit)."""
    global _pending_save
    if _pending_save is not None:
        _pending_save.join()
        _pending_save = None


def restore(path: str, target: Any) -> Any:
    """Restores a TrainingState saved by :func:`save` into ``target``'s
    structure."""
    if _HAS_ORBAX and os.path.isdir(path):
        ckpt = ocp.StandardCheckpointer()
        return ckpt.restore(path, target=jax.device_get(target))
    with open(path if path.endswith(".msgpack") else path + ".msgpack",
              "rb") as f:
        return serialization.from_bytes(target, f.read())


def latest_checkpoint(checkpoint_dir: str) -> str | None:
    """Newest step subdirectory in a checkpoint dir, or None."""
    if not os.path.isdir(checkpoint_dir):
        return None
    steps = []
    for name in os.listdir(checkpoint_dir):
        base = name.removesuffix(".msgpack")
        if base.isdigit():
            steps.append(int(base))
    if not steps:
        return None
    best = str(max(steps))
    cand = os.path.join(checkpoint_dir, best)
    return cand if os.path.exists(cand) else cand + ".msgpack"


# --- brax.io.model-style param save/load (reference train.py:9,156,338) ---

def save_params(path: str, params: Any) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(params)))


def load_params(path: str, target: Any = None) -> Any:
    with open(path, "rb") as f:
        data = f.read()
    if target is None:
        return serialization.msgpack_restore(data)
    return serialization.from_bytes(target, data)
