"""Uniform affine quantization and clamp-casts.

TPU-native equivalents of the reference quantization helpers
(`lrf/compression/utils.py:156-243` in pashtari/lrf). Semantics preserved
exactly, including the reference's quirky `dequantize`, which subtracts the
*quantized tensor's* minimum rather than the dtype minimum
(`lrf/compression/utils.py:241`) — required for byte-level parity with the
reference SVD codec.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

_DTYPE_RANGE = {
    jnp.int8.dtype: (-128, 127),
    jnp.uint8.dtype: (0, 255),
    jnp.int16.dtype: (-(2**15), 2**15 - 1),
    jnp.int32.dtype: (-(2**31), 2**31 - 1),
}


def dtype_range(dtype) -> tuple[float, float]:
    dtype = jnp.dtype(dtype)
    if dtype in _DTYPE_RANGE:
        return _DTYPE_RANGE[dtype]
    if jnp.issubdtype(dtype, jnp.floating):
        info = jnp.finfo(dtype)
        return float(info.min), float(info.max)
    info = jnp.iinfo(dtype)
    return info.min, info.max


def to_dtype(x: jnp.ndarray, dtype) -> jnp.ndarray:
    """Clamp to the representable range of `dtype`, then cast.

    Matches reference `to_dtype` (`lrf/compression/utils.py:156`): note the
    cast truncates toward zero for float->int, exactly like `torch.Tensor.to`.
    """
    lo, hi = dtype_range(dtype)
    return jnp.clip(x, lo, hi).astype(dtype)


def quantize(x: jnp.ndarray, target_dtype):
    """Uniform min/max quantization to `target_dtype`'s full range.

    Matches reference `quantize` (`lrf/compression/utils.py:185`):
    ``q = clamp((x - min) / scale + qmin, qmin, qmax).to(dtype)`` with
    ``scale = (max - min) / (qmax - qmin)``. Returns `(q, scale, min_val)`
    where scale/min_val are 0-d arrays (call `.item()` for metadata).
    """
    qmin, qmax = dtype_range(target_dtype)
    min_val = jnp.min(x)
    max_val = jnp.max(x)
    scale = (max_val - min_val) / (qmax - qmin)
    q = jnp.clip((x - min_val) / scale + qmin, qmin, qmax).astype(target_dtype)
    return q, scale, min_val


def dequantize(q: jnp.ndarray, scale: float, min_val: float) -> jnp.ndarray:
    """Inverse of `quantize` with the reference's tensor-min convention.

    Matches reference `dequantize` (`lrf/compression/utils.py:223`): uses
    ``q - q.min()`` (the *observed* minimum) rather than the dtype `qmin`.
    """
    qf = q.astype(jnp.float32)
    return (qf - jnp.min(qf)) * scale + min_val


def np_dequantize(q: np.ndarray, scale: float, min_val: float) -> np.ndarray:
    """Host-side `dequantize` on numpy arrays (used by decoders)."""
    qf = q.astype(np.float32)
    return (qf - qf.min()) * np.float32(scale) + np.float32(min_val)
