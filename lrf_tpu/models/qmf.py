"""QMF image codec: encode/decode pipelines (flagship).

TPU-native re-implementation of the reference QMF codec
(`lrf/compression/qmf.py` in pashtari/lrf). The whole per-image numeric
pipeline — color transform, chroma area-downsample, reflect pad, 8x8
patchify, SVD-init + integer block-coordinate-descent factorization, int8
cast — is a single jitted function per (image size, rank schedule, config),
so XLA fuses the transforms and keeps everything on-device; only the final
int8 factors come back to the host for serialization. The byte container is
format-identical to the reference (`lrf/compression/qmf.py:288-291`): streams
we produce decode with the reference `qmf_decode`, and vice versa.

Rank/quality semantics (`lrf/compression/qmf.py:147-254`):
- scalar rank r -> (r, max(r//2,1), max(r//2,1)) for (Y, Cb, Cr)
- scalar quality q -> (q, q/2, q/2); R = max(round(min(M,N) * q/100), 1)
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lrf_tpu.models.container import (
    bytes_to_dict,
    combine_bytes,
    decode_tensor,
    dict_to_bytes,
    encode_tensor,
    separate_bytes,
)
from lrf_tpu.ops.bcd import qmf_decompose, qmf_reconstruct
from lrf_tpu.ops.color import rgb_to_ycbcr, ycbcr_to_rgb
from lrf_tpu.ops.pad import pad_amounts, pad_image, unpad_image
from lrf_tpu.ops.patch import depatchify, patchify
from lrf_tpu.ops.quantize import to_dtype
from lrf_tpu.ops.resample import chroma_downsample, chroma_upsample, scaled_size
from lrf_tpu.utils.transfer import to_host

__all__ = ["qmf_encode", "qmf_decode", "qmf_rank"]


def qmf_rank(size: tuple[int, int], com_ratio: float) -> int:
    """Rank for a target compression ratio (`lrf/compression/qmf.py:25`)."""
    num_rows, num_cols = size
    df_input = num_rows * num_cols
    df_lowrank = num_rows + num_cols
    return max(math.floor(df_input / (com_ratio * df_lowrank)), 1)


def _rank_from_quality(mat_size: tuple[int, int], quality: float) -> int:
    """`R = max(round(min(M,N) * q / 100), 1)` (`lrf/compression/qmf.py:176`)."""
    assert 0 <= quality <= 100, "'quality' must be between 0 and 100."
    return max(round(min(mat_size) * quality / 100), 1)


def _patched_mat_size(
    ch_size: tuple[int, int], patch_size: tuple[int, int], channels: int = 1
) -> tuple[int, int]:
    """Shape of the patchified matrix after reflect padding.

    `(num_patches, channels * p * q)`: YCbCr paths patchify one channel at a
    time (channels=1); RGB paths patchify the whole 3-channel image.
    """
    t, b, l, r = pad_amounts(ch_size, patch_size)
    hp, wp = ch_size[0] + t + b, ch_size[1] + l + r
    p, q = patch_size
    return (hp // p) * (wp // q), channels * p * q


# --------------------------------------------------------------------------
# jitted encode cores (cached per static config)
# --------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _ycbcr_patch_encoder(
    size, ranks, scale_factor, patch_size, bounds, num_iters, dtype_name, bcd_kwargs
):
    dtype = jnp.dtype(dtype_name)
    kw = dict(bcd_kwargs)

    def encode(image: jnp.ndarray):
        ycbcr = rgb_to_ycbcr(image.astype(jnp.float32))
        channels = chroma_downsample(ycbcr, scale_factor)
        factors = []
        for channel, rank in zip(channels, ranks):
            x = pad_image(channel, patch_size)
            xm = patchify(x, patch_size)
            u, v, _ = qmf_decompose(
                xm, rank=rank, num_iters=num_iters, bounds=bounds, factor=(0, 1), **kw
            )
            factors.append(u.astype(dtype))
            factors.append(v.astype(dtype))
        return tuple(factors)

    return jax.jit(encode)


@lru_cache(maxsize=None)
def _ycbcr_nopatch_encoder(
    size, ranks, scale_factor, bounds, num_iters, dtype_name, bcd_kwargs
):
    dtype = jnp.dtype(dtype_name)
    kw = dict(bcd_kwargs)

    def encode(image: jnp.ndarray):
        ycbcr = rgb_to_ycbcr(image.astype(jnp.float32))
        channels = chroma_downsample(ycbcr, scale_factor)
        factors = []
        for channel, rank in zip(channels, ranks):
            # Keep the leading singleton channel dim: factors stay 3-D
            # (1, H, R), which routes them through the whole-tensor coder
            # exactly like the reference (`lrf/compression/qmf.py:281-286`).
            u, v, _ = qmf_decompose(
                channel, rank=rank, num_iters=num_iters, bounds=bounds, factor=(0, 1), **kw
            )
            factors.append(u.astype(dtype))
            factors.append(v.astype(dtype))
        return tuple(factors)

    return jax.jit(encode)


@lru_cache(maxsize=None)
def _rgb_encoder(size, rank, patch, patch_size, bounds, num_iters, dtype_name, bcd_kwargs):
    dtype = jnp.dtype(dtype_name)
    kw = dict(bcd_kwargs)

    def encode(image: jnp.ndarray):
        x = image.astype(jnp.float32)
        if patch:
            x = pad_image(x, patch_size)
            xm = patchify(x, patch_size)
        else:
            xm = x
        u, v, _ = qmf_decompose(
            xm, rank=rank, num_iters=num_iters, bounds=bounds, factor=(0, 1), **kw
        )
        return u.astype(dtype), v.astype(dtype)

    return jax.jit(encode)


# --------------------------------------------------------------------------
# encode
# --------------------------------------------------------------------------


def qmf_encode(
    image,
    rank: Optional[int | tuple[int, int, int]] = None,
    quality: Optional[float | tuple[float, float, float]] = None,
    color_space: str = "YCbCr",
    scale_factor: tuple[float, float] = (0.5, 0.5),
    patch: bool = True,
    patch_size: tuple[int, int] = (8, 8),
    bounds: tuple[float, float] = (-16, 15),
    dtype=np.int8,
    num_iters: int = 10,
    **kwargs,
) -> bytes:
    """QMF compression of a `(3, H, W)` image to bytes.

    Mirrors reference `qmf_encode` (`lrf/compression/qmf.py:116`) — same
    parameters, same metadata keys and framing, same defaults.
    """
    assert (rank, quality) != (None, None), "Either 'rank' or 'quality' must be specified."
    assert color_space in ("RGB", "YCbCr"), "`color_space` must be one of 'RGB' or 'YCbCr'."

    image = jnp.asarray(image)
    dtype_name = np.dtype(dtype).name
    image_dtype_name = np.dtype(np.asarray(image).dtype).name
    bounds = tuple(bounds)
    # patch_size is unused (and may be None) when patch=False — the
    # reference likewise never touches it there (`compression/qmf.py:155`)
    patch_size = tuple(patch_size) if patch else (8, 8)
    scale_factor = tuple(scale_factor)
    bcd_kwargs = tuple(sorted(kwargs.items()))
    size = (int(image.shape[-2]), int(image.shape[-1]))

    metadata = {
        "dtype": image_dtype_name,
        "color space": color_space,
        "patch": patch,
        "bounds": list(bounds),
    }

    if color_space == "RGB":
        if patch:
            mat_size = _patched_mat_size(size, patch_size, channels=3)
            r = _rank_from_quality(mat_size, quality) if rank is None else rank
            t, b, l, rr = pad_amounts(size, patch_size)
            metadata.update(
                {
                    "patch size": list(patch_size),
                    "original size": list(size),
                    "padded size": [size[0] + t + b, size[1] + l + rr],
                    "rank": r,
                }
            )
        else:
            r = _rank_from_quality(size, quality) if rank is None else rank
            metadata["rank"] = r
        encoder = _rgb_encoder(
            size, r, patch, patch_size, bounds, num_iters, dtype_name, bcd_kwargs
        )
        u, v = encoder(image)
        factors = [to_host(u), to_host(v)]

    else:  # YCbCr
        if not isinstance(rank, Iterable):
            rank = (None,) * 3 if rank is None else (rank, max(rank // 2, 1), max(rank // 2, 1))
        if not isinstance(quality, Iterable):
            quality = (None,) * 3 if quality is None else (quality, quality / 2, quality / 2)

        chroma_size = scaled_size(size, scale_factor)
        ch_sizes = (size, chroma_size, chroma_size)

        ranks = []
        for i, ch_size in enumerate(ch_sizes):
            if rank[i] is None:
                mat_size = (
                    _patched_mat_size(ch_size, patch_size) if patch else ch_size
                )
                ranks.append(_rank_from_quality(mat_size, quality[i]))
            else:
                ranks.append(rank[i])
        ranks = tuple(ranks)

        if patch:
            metadata["patch size"] = list(patch_size)
            metadata["original size"] = [list(s) for s in ch_sizes]
            padded_sizes = []
            for ch_size in ch_sizes:
                t, b, l, rr = pad_amounts(ch_size, patch_size)
                padded_sizes.append([ch_size[0] + t + b, ch_size[1] + l + rr])
            metadata["padded size"] = padded_sizes
            metadata["rank"] = list(ranks)
            encoder = _ycbcr_patch_encoder(
                size, ranks, scale_factor, patch_size, bounds, num_iters, dtype_name, bcd_kwargs
            )
        else:
            metadata["original size"] = [list(s) for s in ch_sizes]
            metadata["rank"] = list(ranks)
            encoder = _ycbcr_nopatch_encoder(
                size, ranks, scale_factor, bounds, num_iters, dtype_name, bcd_kwargs
            )
        factors = [to_host(f) for f in encoder(image)]

    encoded_metadata = dict_to_bytes(metadata)
    encoded_factors = combine_bytes([encode_tensor(f) for f in factors])
    return combine_bytes([encoded_metadata, encoded_factors])


# --------------------------------------------------------------------------
# decode
# --------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _ycbcr_patch_decoder(orig_sizes, padded_sizes, patch_size, uv_shapes, out_dtype):
    def decode(*factors):
        ycbcr = []
        for i in range(3):
            u = factors[2 * i].astype(jnp.float32)
            v = factors[2 * i + 1].astype(jnp.float32)
            x = qmf_reconstruct(u, v)
            channel = depatchify(x, padded_sizes[i], patch_size)
            channel = unpad_image(channel, orig_sizes[i])
            ycbcr.append(channel)
        image = chroma_upsample(tuple(ycbcr), size=orig_sizes[0], mode="nearest")
        image = ycbcr_to_rgb(image)
        return to_dtype(image, jnp.dtype(out_dtype))

    return jax.jit(decode)


@lru_cache(maxsize=None)
def _ycbcr_nopatch_decoder(orig_sizes, uv_shapes, out_dtype):
    def decode(*factors):
        ycbcr = []
        for i in range(3):
            u = factors[2 * i].astype(jnp.float32)
            v = factors[2 * i + 1].astype(jnp.float32)
            ycbcr.append(qmf_reconstruct(u, v))  # (1, H, W): channel dim kept
        image = chroma_upsample(tuple(ycbcr), size=orig_sizes[0], mode="nearest")
        image = ycbcr_to_rgb(image)
        return to_dtype(image, jnp.dtype(out_dtype))

    return jax.jit(decode)


@lru_cache(maxsize=None)
def _rgb_decoder(patch, orig_size, padded_size, patch_size, uv_shapes, out_dtype):
    def decode(u, v):
        x = qmf_reconstruct(u.astype(jnp.float32), v.astype(jnp.float32))
        if patch:
            image = depatchify(x, padded_size, patch_size)
            image = unpad_image(image, orig_size)
        else:
            image = x
        return to_dtype(image, jnp.dtype(out_dtype))

    return jax.jit(decode)


def qmf_decode(encoded_image: bytes) -> np.ndarray:
    """Decode a QMF stream (`lrf/compression/qmf.py:295`) to a `(3, H, W)` array."""
    encoded_metadata, encoded_factors = separate_bytes(encoded_image, 2)
    metadata = bytes_to_dict(encoded_metadata)
    out_dtype = metadata["dtype"]

    if metadata["color space"] == "RGB":
        encoded_u, encoded_v = separate_bytes(encoded_factors, 2)
        u, v = decode_tensor(encoded_u), decode_tensor(encoded_v)
        if metadata["patch"]:
            decoder = _rgb_decoder(
                True,
                tuple(metadata["original size"]),
                tuple(metadata["padded size"]),
                tuple(metadata["patch size"]),
                (u.shape, v.shape),
                out_dtype,
            )
        else:
            decoder = _rgb_decoder(
                False, None, None, None, (u.shape, v.shape), out_dtype
            )
        return to_host(decoder(jnp.asarray(u), jnp.asarray(v)))

    # YCbCr
    blobs = separate_bytes(encoded_factors, 6)
    factors = [decode_tensor(b) for b in blobs]
    uv_shapes = tuple(f.shape for f in factors)
    orig_sizes = tuple(tuple(s) for s in metadata["original size"])
    if metadata["patch"]:
        decoder = _ycbcr_patch_decoder(
            orig_sizes,
            tuple(tuple(s) for s in metadata["padded size"]),
            tuple(metadata["patch size"]),
            uv_shapes,
            out_dtype,
        )
    else:
        decoder = _ycbcr_nopatch_decoder(orig_sizes, uv_shapes, out_dtype)
    return to_host(decoder(*[jnp.asarray(f) for f in factors]))
