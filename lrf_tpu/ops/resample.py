"""Spatial resampling: adaptive area pooling and nearest-neighbour resize.

TPU-native equivalents of the reference's `torch.nn.functional.interpolate`
usage (`lrf/compression/utils.py:76-105` in pashtari/lrf):

- encode-side chroma downsampling uses ``mode="area"``, which for integer
  scale factors is an exact mean-pool and in general equals adaptive average
  pooling (output pixel *i* averages input window
  ``[floor(i*H/Ho), ceil((i+1)*H/Ho))``).
- QMF decode upsamples chroma with ``mode="nearest"``
  (`lrf/compression/qmf.py:346`), SVD decode with ``mode="area"``
  (`lrf/compression/svd.py:356`) — both reproduced here.

All functions take static output sizes so they are jittable; the common
2x-downsample case lowers to a reshape+mean that XLA fuses onto the VPU.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _area_pool_1d(x: jnp.ndarray, out_size: int, axis: int) -> jnp.ndarray:
    """Adaptive average pool along one axis (torch `interpolate(mode='area')`)."""
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    if in_size % out_size == 0:
        # Exact mean-pool: reshape (..., out, k, ...) and mean over k.
        k = in_size // out_size
        new_shape = x.shape[:axis] + (out_size, k) + x.shape[axis + 1 :]
        return jnp.mean(x.reshape(new_shape), axis=axis + 1)
    # General adaptive windows via a static (out, in) averaging matrix.
    starts = np.floor(np.arange(out_size) * in_size / out_size).astype(np.int64)
    ends = np.ceil((np.arange(out_size) + 1) * in_size / out_size).astype(np.int64)
    weights = np.zeros((out_size, in_size), dtype=np.float32)
    for i, (s, e) in enumerate(zip(starts, ends)):
        weights[i, s:e] = 1.0 / (e - s)
    w = jnp.asarray(weights)
    x_moved = jnp.moveaxis(x, axis, -1)
    pooled = jnp.einsum("oi,...i->...o", w, x_moved)
    return jnp.moveaxis(pooled, -1, axis)


def area_resize(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """Adaptive average-pool resize of `(..., H, W)` to `size` (static)."""
    x = _area_pool_1d(x.astype(jnp.float32), size[0], axis=x.ndim - 2)
    x = _area_pool_1d(x, size[1], axis=x.ndim - 1)
    return x


def nearest_resize(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """Nearest-neighbour resize of `(..., H, W)` to `size` (static).

    Index rule matches torch ``interpolate(mode="nearest")``:
    ``src = floor(dst * in / out)``.
    """
    h_in, w_in = x.shape[-2], x.shape[-1]
    h_out, w_out = size
    rows = np.floor(np.arange(h_out) * h_in / h_out).astype(np.int32)
    cols = np.floor(np.arange(w_out) * w_in / w_out).astype(np.int32)
    return x[..., jnp.asarray(rows), :][..., jnp.asarray(cols)]


def scaled_size(in_size: tuple[int, int], scale_factor: tuple[float, float]) -> tuple[int, int]:
    """Output size rule of torch `interpolate(scale_factor=...)`: floor(H*s)."""
    return (
        int(np.floor(in_size[0] * scale_factor[0])),
        int(np.floor(in_size[1] * scale_factor[1])),
    )


def chroma_downsample(
    ycbcr: jnp.ndarray, scale_factor: tuple[float, float] = (0.5, 0.5)
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Split `(3, H, W)` YCbCr into (Y, Cb, Cr) with area-downsampled chroma.

    Mirrors reference `chroma_downsampling` (`lrf/compression/utils.py:76`):
    Y untouched; Cb/Cr adaptive-area pooled to ``floor(H*s) x floor(W*s)``.
    Returns channels with a leading singleton channel dim, like the reference.
    """
    h, w = ycbcr.shape[-2], ycbcr.shape[-1]
    out_size = scaled_size((h, w), scale_factor)
    y = ycbcr[..., 0:1, :, :]
    cb = area_resize(ycbcr[..., 1:2, :, :], out_size)
    cr = area_resize(ycbcr[..., 2:3, :, :], out_size)
    return y, cb, cr


def chroma_upsample(
    ycbcr: tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],
    size: tuple[int, int],
    mode: str = "nearest",
) -> jnp.ndarray:
    """Upsample Cb/Cr to `size` and restack into `(..., 3, H, W)`.

    Mirrors reference `chroma_upsampling` (`lrf/compression/utils.py:98`);
    `mode` is "nearest" for the QMF decoder and "area" for the SVD decoder.
    """
    y, cb, cr = ycbcr
    resize = nearest_resize if mode == "nearest" else area_resize
    cb = resize(cb, size)
    cr = resize(cr, size)
    return jnp.concatenate([y, cb, cr], axis=-3)


# Reference-spelled aliases (`lrf/compression/utils.py:76,98` name these
# `chroma_downsampling`/`chroma_upsampling`), so reference users can switch
# without renaming call sites.
chroma_downsampling = chroma_downsample
chroma_upsampling = chroma_upsample
