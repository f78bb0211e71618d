"""Clip file IO.

Loads the reference's shipped clip pickles (including the legacy 13-field
``ReferenceClip`` written by /root/reference/mocap_preprocess.py:326-340,
pickled with an older jax) without importing the reference codebase: a
tolerant unpickler maps unknown classes to plain namespaces and old jax
array reducers to numpy.  Also reads STAC qpos pickles and the h5 layout
(``clip_N/walkers/walker_0/...``, mocap_preprocess.py:379-411).
"""

from __future__ import annotations

import pickle
from typing import Any, Dict, Optional

import numpy as np

from vnl_tpu.data.reference_clip import ReferenceClip


class _Namespace:
    """Stand-in for classes we don't (want to) import."""

    def __init__(self, *args, **kwargs):
        self.__dict__.update(kwargs)
        if args:
            self.__dict__["_args"] = args

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        else:
            self.__dict__["_state"] = state


def _np_reconstruct(fun, args, arr_state=None, aval_state=None):
    """Replacement for jax's pickled array reducer -> plain numpy."""
    out = fun(*args)
    if arr_state is not None:
        try:
            out.__setstate__(arr_state)
        except Exception:
            pass
    return np.asarray(out)


class _TolerantUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        if name == "_reconstruct_array":
            return _np_reconstruct
        try:
            return super().find_class(module, name)
        except Exception:
            ns = type(name, (_Namespace,), {"__module__": module})
            return ns


def load_pickle(path: str) -> Any:
    with open(path, "rb") as f:
        return _TolerantUnpickler(f).load()


_CLIP_FIELDS = ("position", "quaternion", "joints", "body_positions",
                "body_quaternions", "velocity", "joints_velocity",
                "angular_velocity", "center_of_mass", "end_effectors",
                "appendages", "markers", "scaling")


def load_clip(path: str) -> ReferenceClip:
    """Loads a ReferenceClip pickle (8-field mjx or 13-field legacy)."""
    obj = load_pickle(path)
    d = obj if isinstance(obj, dict) else obj.__dict__
    kwargs: Dict[str, Optional[np.ndarray]] = {}
    for f in _CLIP_FIELDS:
        v = d.get(f)
        kwargs[f] = None if v is None else np.asarray(v)
    return ReferenceClip(**kwargs)


def load_stac_qpos(path: str) -> np.ndarray:
    """Loads a STAC fit pickle and returns the qpos trajectory (T, nq)."""
    d = load_pickle(path)
    if not isinstance(d, dict):
        d = d.__dict__
    return np.asarray(d["qpos"])
