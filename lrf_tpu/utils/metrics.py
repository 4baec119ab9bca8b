"""Quality and rate metrics as on-device jnp reductions.

Equivalents of `lrf/utils/metrics.py` in pashtari/lrf. PSNR/MSE/MAE/relative
error are trivial reductions over the last three dims. SSIM re-implements
`skimage.metrics.structural_similarity` with the defaults the reference
relies on (`lrf/utils/metrics.py:85-91`): 7x7 uniform window, sample
covariance normalization (N/(N-1)), K1=0.01 / K2=0.03,
``data_range = img1.max() - img1.min()``, per-channel SSIM averaged over
channels (channel_axis=0), boundary cropped by (win-1)//2. Because the crop
removes every window that touches the border, only fully-interior ("valid")
windows contribute, so the filter is a valid-mode mean pool and skimage's
edge padding mode is irrelevant.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "mae",
    "mse",
    "relative_error",
    "psnr",
    "ssim",
    "get_memory_usage",
    "compression_ratio",
    "bits_per_pixel",
]


def mae(x, y):
    """Mean absolute error over the last three dims (`utils/metrics.py:10`).

    Inputs cast to float32: integer subtraction would wrap modulo the
    dtype (a -1 pixel difference on uint8 reads as 255). The reference
    refuses integer tensors outright; accepting-and-casting keeps the
    uint8 codec outputs directly usable."""
    x = jnp.asarray(x).astype(jnp.float32)
    y = jnp.asarray(y).astype(jnp.float32)
    return jnp.mean(jnp.abs(x - y), axis=(-3, -2, -1))


def mse(x, y):
    """Mean squared error over the last three dims (`utils/metrics.py:24`).
    Float32-cast like `mae` (integer inputs would wrap)."""
    x = jnp.asarray(x).astype(jnp.float32)
    y = jnp.asarray(y).astype(jnp.float32)
    return jnp.mean((x - y) ** 2, axis=(-3, -2, -1))


def relative_error(x, y, epsilon: float = 1e-16):
    """Relative L2 error over the last three dims (`utils/metrics.py:38`)."""
    x = jnp.asarray(x).astype(jnp.float32)
    y = jnp.asarray(y).astype(jnp.float32)
    num = jnp.sqrt(jnp.sum((x - y) ** 2, axis=(-3, -2, -1)))
    den = jnp.sqrt(jnp.sum(x**2, axis=(-3, -2, -1)))
    return num / (den + epsilon)


def psnr(img1, img2, max_value: float = 255.0):
    """`20 log10(max / sqrt(mse))` (`utils/metrics.py:57`)."""
    img1 = jnp.asarray(img1).astype(jnp.float32)
    img2 = jnp.asarray(img2).astype(jnp.float32)
    m = mse(img1, img2)
    return 20.0 * jnp.log10(max_value / jnp.sqrt(m))


def _valid_mean_pool(x: jnp.ndarray, win: int) -> jnp.ndarray:
    """Valid-mode `win x win` mean filter over the last two dims."""
    ones = jnp.ones((win, win), dtype=x.dtype)
    lhs = x[:, None, :, :]  # (C, 1, H, W)
    rhs = ones[None, None, :, :]
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1, 1), padding="VALID"
    )
    return out[:, 0] / (win * win)


def _ssim_jax(img1: jnp.ndarray, img2: jnp.ndarray, data_range, win: int = 7):
    k1, k2 = 0.01, 0.03
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    x = img1.astype(jnp.float32)
    y = img2.astype(jnp.float32)
    np_ = win * win
    cov_norm = np_ / (np_ - 1.0)  # sample covariance, as in skimage

    ux = _valid_mean_pool(x, win)
    uy = _valid_mean_pool(y, win)
    uxx = _valid_mean_pool(x * x, win)
    uyy = _valid_mean_pool(y * y, win)
    uxy = _valid_mean_pool(x * y, win)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    a1 = 2.0 * ux * uy + c1
    a2 = 2.0 * vxy + c2
    b1 = ux * ux + uy * uy + c1
    b2 = vx + vy + c2
    s = (a1 * a2) / (b1 * b2)
    # skimage crops pad=(win-1)//2 from each edge of the *full* SSIM map; the
    # valid map is already smaller by 2*pad, so it equals the cropped region.
    return jnp.mean(s, axis=(-2, -1)).mean()


_ssim_jit = jax.jit(_ssim_jax, static_argnames=("win",))


def ssim(img1, img2) -> jnp.ndarray:
    """SSIM matching the reference's skimage call (`utils/metrics.py:74`).

    `img1`, `img2`: `(C, H, W)`. data_range is `img1.max() - img1.min()`
    computed on the *first* image, exactly like the reference.
    """
    img1 = jnp.asarray(img1)
    img2 = jnp.asarray(img2)
    data_range = (
        img1.astype(jnp.float32).max() - img1.astype(jnp.float32).min()
    )
    return _ssim_jit(img1, img2, data_range)


def get_memory_usage(obj: Any) -> int:
    """Recursive byte size of arrays/bytes containers (`utils/metrics.py:94`)."""
    if isinstance(obj, (list, tuple, set)):
        return sum(get_memory_usage(o) for o in obj)
    if isinstance(obj, dict):
        return sum(get_memory_usage(o) for o in obj.values())
    if isinstance(obj, bytes):
        return len(obj)
    if isinstance(obj, np.ndarray):
        return obj.nbytes
    if isinstance(obj, jnp.ndarray):
        return obj.size * obj.dtype.itemsize
    try:  # torch tensors, without importing torch
        return obj.numel() * obj.element_size()
    except AttributeError:
        raise ValueError(
            "Unsupported data type: provide arrays, bytes, or containers thereof."
        )


def compression_ratio(input: Any, compressed: Any) -> float:
    """`input_bytes / compressed_bytes` (`utils/metrics.py:120`)."""
    return get_memory_usage(input) / get_memory_usage(compressed)


def bits_per_pixel(size, compressed: Any) -> float:
    """`compressed_bytes * 8 / prod(size)` (`utils/metrics.py:149`)."""
    num_pixels = int(np.prod(size))
    return get_memory_usage(compressed) * 8 / num_pixels
