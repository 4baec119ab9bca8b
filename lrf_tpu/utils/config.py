"""JSON config IO with dtype (de)serialization hooks.

Equivalent of the reference's config helpers (`lrf/utils/misc.py:686-759` in
pashtari/lrf), which serialize experiment kwargs — including torch dtypes —
to JSON. Here dtypes are numpy/jax dtypes, serialized as ``"dtype::<name>"``
strings; for compatibility we also parse the reference's ``torch.<name>``
representation back into numpy dtypes.
"""

from __future__ import annotations

import json
import os
from typing import Any

import numpy as np

__all__ = ["json_serializer", "save_config", "read_config"]

_DTYPE_PREFIX = "dtype::"


def json_serializer(obj: Any):
    """Serializer hook for numpy/jax dtypes and arrays (`utils/misc.py:686`)."""
    if isinstance(obj, np.dtype):
        return _DTYPE_PREFIX + obj.name
    if isinstance(obj, type) and issubclass(obj, np.generic):
        return _DTYPE_PREFIX + np.dtype(obj).name
    if hasattr(obj, "dtype") and hasattr(obj, "tolist"):
        return obj.tolist()
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    raise TypeError(f"Object of type {type(obj)} is not JSON serializable")


def _decode_value(v: Any):
    if isinstance(v, str):
        if v.startswith(_DTYPE_PREFIX):
            return np.dtype(v[len(_DTYPE_PREFIX):])
        if v.startswith("torch."):  # reference-format config files
            return np.dtype(v.split(".", 1)[1])
    if isinstance(v, dict):
        return {k: _decode_value(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_decode_value(x) for x in v]
    return v


def save_config(config: Any, path: str) -> None:
    """Save a (nested) config/results object to JSON (`utils/misc.py:736`)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        json.dump(config, f, default=json_serializer, indent=2)


def read_config(path: str):
    """Load a JSON config, reviving dtype strings (`utils/misc.py:704`)."""
    with open(path) as f:
        return _decode_value(json.load(f))
