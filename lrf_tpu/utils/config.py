"""JSON results/config IO with dtype (de)serialization hooks.

Equivalent of the reference's config helpers (`lrf/utils/misc.py:686-759` in
pashtari/lrf): `save_config(results, save_dir=..., prefix=...)` writes
``{prefix}_results.json`` exactly like the reference experiment drivers
expect, and `read_config` revives dtype strings. Dtypes here are numpy/jax
dtypes serialized as ``"dtype::<name>"``; the reference's ``torch.<name>``
strings are also parsed back into numpy dtypes so its stored results files
load directly.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional, Sequence

import numpy as np

__all__ = ["json_serializer", "json_deserializer", "save_config", "read_config"]

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


def json_deserializer(dct: dict) -> dict:
    """Object hook reviving dtype strings (`utils/misc.py:704`), including
    the reference's ``torch.<name>`` representation."""
    for key, value in dct.items():
        if isinstance(value, str):
            if value.startswith(_DTYPE_PREFIX):
                dct[key] = np.dtype(value[len(_DTYPE_PREFIX):])
            elif value.startswith("torch."):
                try:
                    dct[key] = np.dtype(value.split(".", 1)[1])
                except TypeError:
                    pass
    return dct


def save_config(
    data: Sequence[dict] | dict,
    save_dir: Optional[str] = None,
    prefix: str = "",
) -> None:
    """Save results to ``{save_dir}/{prefix}_results.json`` (`utils/misc.py:736`)."""
    if save_dir is None:
        raise FileNotFoundError("Save directory must be specified")
    os.makedirs(save_dir, exist_ok=True)
    # Atomic write: sweep drivers checkpoint this file after every image, so
    # a crash mid-dump must not corrupt the resume state.
    path = os.path.join(save_dir, f"{prefix}_results.json")
    tmp = f"{path}.tmp"
    with open(tmp, "w") as f:
        json.dump(data, f, indent=4, default=json_serializer)
    os.replace(tmp, path)


def read_config(file_name: str):
    """Load a results/config JSON, reviving dtype strings (`utils/misc.py:720`)."""
    with open(file_name) as f:
        return json.load(f, object_hook=json_deserializer)
