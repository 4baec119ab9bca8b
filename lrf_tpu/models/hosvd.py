"""HOSVD (Tucker) codecs: whole-image and patch-HOSVD.

TPU-native equivalents of `lrf/compression/hosvd.py` in pashtari/lrf. Like
the reference, these codecs produce a quantized-dict representation (not a
framed byte stream). The rank-for-CR solvers replace the reference's sympy
root-solving with the closed-form positive root of the same quadratics —
identical results, no symbolic dependency.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from lrf_tpu.ops.hosvd import hosvd, hosvd_rank_feasible_ranges, multi_mode_product
from lrf_tpu.ops.pad import pad_image, unpad_image
from lrf_tpu.ops.quantize import quantize
from lrf_tpu.utils.metrics import ssim

__all__ = [
    "hosvd_rank",
    "hosvd_compression_ratio",
    "hosvd_encode",
    "hosvd_decode",
    "patch_hosvd_encode",
    "patch_hosvd_decode",
    "patch_hosvd_optimal_rank",
    "patch_hosvd_tensorize",
    "patch_hosvd_detensorize",
]


def _positive_quadratic_root(a: float, b: float, c: float) -> Optional[float]:
    """Smallest positive real root of a x^2 + b x + c = 0 (a > 0)."""
    disc = b * b - 4 * a * c
    if disc < 0:
        return None
    roots = [(-b - math.sqrt(disc)) / (2 * a), (-b + math.sqrt(disc)) / (2 * a)]
    pos = [r for r in roots if r > 0]
    return min(pos) if pos else None


def hosvd_rank(size: tuple[int, int, int], com_ratio: float):
    """Rank tuple `(c, r, r)` for a target CR (`lrf/compression/hosvd.py:19`).

    Solves ``c*h*w = cr * (c*r^2 + c^2 + r*h + r*w)`` for r in closed form.
    """
    c, h, w = size
    df_input = c * h * w
    # cr*(c r^2 + (h+w) r + c^2) - df = 0
    r = _positive_quadratic_root(
        com_ratio * c, com_ratio * (h + w), com_ratio * c * c - df_input
    )
    assert r is not None, "no feasible rank for this compression ratio"
    r = min(int(math.floor(r)), h, w)
    return c, r, r


def hosvd_compression_ratio(size: Sequence[int], rank) -> float:
    """CR for a rank tuple (`lrf/compression/hosvd.py:32`)."""
    if isinstance(rank, int):
        rank = (rank,) * len(size)
    df_input = int(np.prod(size))
    df_core = int(np.prod(rank))
    df_factors = sum(s * r for s, r in zip(size, rank))
    return df_input / (df_core + df_factors)


def _to_unit_float(x) -> jnp.ndarray:
    """uint8 -> float32 in [0, 1] (torchvision `to_dtype(..., scale=True)`)."""
    x = jnp.asarray(x)
    if x.dtype == jnp.uint8:
        return x.astype(jnp.float32) / 255.0
    return x.astype(jnp.float32)


def _to_uint8(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(jnp.round(x * 255.0), 0, 255).astype(jnp.uint8)


def hosvd_encode(
    x,
    rank: Optional[Sequence[int]] = None,
    com_ratio: Optional[float] = None,
    dtype=None,
) -> Dict:
    """Whole-image Tucker codec (`lrf/compression/hosvd.py:44`)."""
    assert rank is not None or com_ratio is not None, (
        "Either 'rank' or 'com_ratio' must be specified."
    )
    x = jnp.asarray(x)
    in_dtype = np.dtype(np.asarray(x).dtype)
    dtype = in_dtype if dtype is None else np.dtype(dtype)
    if rank is None:
        rank = hosvd_rank(tuple(x.shape), com_ratio)

    xf = _to_unit_float(x)
    core, factors = hosvd(xf, rank=tuple(rank))

    if dtype != np.float32:
        jdt = jnp.dtype(dtype)
        q, s, m = quantize(core, jdt)
        core = (np.asarray(q), float(s), float(m))
        factors = [
            (lambda out: (np.asarray(out[0]), float(out[1]), float(out[2])))(
                quantize(f, jdt)
            )
            for f in factors
        ]
    else:
        core = np.asarray(core)
        factors = [np.asarray(f) for f in factors]
    return {"core": core, "factors": factors}


def _maybe_dequantize(t):
    from lrf_tpu.ops.quantize import np_dequantize

    if isinstance(t, tuple):
        return jnp.asarray(np_dequantize(np.asarray(t[0]), t[1], t[2]))
    return jnp.asarray(t, jnp.float32)


def hosvd_decode(encoded: Dict, dtype=np.uint8):
    """Inverse of `hosvd_encode` (`lrf/compression/hosvd.py:72`)."""
    core = _maybe_dequantize(encoded["core"])
    factors = [_maybe_dequantize(f) for f in encoded["factors"]]
    x = multi_mode_product(core, factors, transpose=False)
    return np.asarray(_to_uint8(jnp.clip(x, 0.0, 1.0)))


# --------------------------------------------------------------------------
# patch HOSVD
# --------------------------------------------------------------------------


def patch_hosvd_tensorize(x: jnp.ndarray, patch_size=(8, 8)) -> jnp.ndarray:
    """`c (h p) (w q) -> (h w) p q c` (`lrf/compression/hosvd.py:89`)."""
    p, q = patch_size
    c, hh, ww = x.shape
    h, w = hh // p, ww // q
    x = x.reshape(c, h, p, w, q)
    return x.transpose(1, 3, 2, 4, 0).reshape(h * w, p, q, c)


def patch_hosvd_detensorize(
    x: jnp.ndarray, size: tuple[int, int], patch_size=(8, 8)
) -> jnp.ndarray:
    """Inverse of `patch_hosvd_tensorize` (`lrf/compression/hosvd.py:95`)."""
    p, q = patch_size
    h = size[0] // p
    hw, _, _, c = x.shape
    w = hw // h
    x = x.reshape(h, w, p, q, c)
    return x.transpose(4, 0, 2, 1, 3).reshape(c, h * p, w * q)


def patch_hosvd_optimal_rank(x, com_ratio: float, patch_size=(8, 8)):
    """SSIM-driven `(r1, r2, r2, c)` search (`lrf/compression/hosvd.py:102`).

    One full-rank-bounded HOSVD, then per-r1 closed-form solve of the DoF
    quadratic for r2 (replacing the reference's sympy), SSIM-scoring each
    truncation against the input.
    """
    xf = _to_unit_float(x)
    _, h, w = xf.shape
    tensor = patch_hosvd_tensorize(xf, patch_size)
    n, p, q, c = size = tuple(tensor.shape)
    rank_ranges = hosvd_rank_feasible_ranges(size, com_ratio, (None, None, None, c))
    (r1_min, r1_max), (_, r2_max), *_ = rank_ranges
    df_input = int(np.prod(size))
    core, factors = hosvd(tensor, rank=(r1_max, r2_max, r2_max, c))
    best = None
    for r1 in range(r1_min, r1_max + 1):
        # df_core = r1*r2^2*c, df_factors = r1*n + r2*(p+q) + c^2
        r2 = _positive_quadratic_root(
            com_ratio * r1 * c,
            com_ratio * (p + q),
            com_ratio * (r1 * n + c * c) - df_input,
        )
        if r2 is None:
            continue
        r2 = min(int(math.floor(r2)), p)
        if r2 < 1:
            continue
        truncated_core = core[:r1, :r2, :r2, :]
        truncated_factors = [
            factors[0][:, :r1],
            factors[1][:, :r2],
            factors[2][:, :r2],
            factors[3],
        ]
        recon = multi_mode_product(truncated_core, truncated_factors, transpose=False)
        recon_img = patch_hosvd_detensorize(recon, (h, w), patch_size)
        score = float(ssim(xf, recon_img))
        if best is None or score > best[0]:
            best = (score, r1, r2)
    assert best is not None, "rank search found no feasible (r1, r2)"
    _, r1, r2 = best
    return r1, r2, r2, c


def patch_hosvd_encode(
    x,
    rank: Optional[tuple[int, int, int, int]] = None,
    com_ratio: Optional[float] = None,
    bpp: Optional[float] = None,
    patch_size: tuple[int, int] = (8, 8),
    dtype=None,
) -> Dict:
    """Patch-HOSVD codec (`lrf/compression/hosvd.py:144`)."""
    assert (rank, com_ratio, bpp) != (None, None, None), (
        "Either 'rank', 'com_ratio', or 'bpp' must be specified."
    )
    x = jnp.asarray(x)
    in_dtype = np.dtype(np.asarray(x).dtype)
    dtype = in_dtype if dtype is None else np.dtype(dtype)

    orig_size = (int(x.shape[-2]), int(x.shape[-1]))
    x = pad_image(x, patch_size)
    padded_size = (int(x.shape[-2]), int(x.shape[-1]))

    if rank is None:
        if com_ratio is None:
            com_ratio = 8 * in_dtype.itemsize * int(x.shape[0]) / bpp
        rank = patch_hosvd_optimal_rank(x, com_ratio, patch_size)

    xf = _to_unit_float(x)
    tensor = patch_hosvd_tensorize(xf, patch_size)
    core, factors = hosvd(tensor, rank=tuple(rank))

    if dtype != np.float32:
        jdt = jnp.dtype(dtype)
        q, s, m = quantize(core, jdt)
        core = (np.asarray(q), float(s), float(m))
        factors = [
            (lambda out: (np.asarray(out[0]), float(out[1]), float(out[2])))(
                quantize(f, jdt)
            )
            for f in factors
        ]
    else:
        core = np.asarray(core)
        factors = [np.asarray(f) for f in factors]

    return {
        "core": core,
        "factors": factors,
        "original size": np.asarray(orig_size, np.int16),
        "padded size": np.asarray(padded_size, np.int16),
        "patch size": np.asarray(patch_size, np.uint8),
    }


def patch_hosvd_decode(encoded: Dict, dtype=np.uint8):
    """Inverse of `patch_hosvd_encode` (`lrf/compression/hosvd.py:191`)."""
    core = _maybe_dequantize(encoded["core"])
    factors = [_maybe_dequantize(f) for f in encoded["factors"]]
    orig_size = tuple(int(v) for v in np.asarray(encoded["original size"]))
    padded_size = tuple(int(v) for v in np.asarray(encoded["padded size"]))
    patch_size = tuple(int(v) for v in np.asarray(encoded["patch size"]))

    recon = multi_mode_product(core, factors, transpose=False)
    image = patch_hosvd_detensorize(recon, padded_size, patch_size)
    image = _to_uint8(jnp.clip(image, 0.0, 1.0))
    return np.asarray(unpad_image(image, orig_size))
