"""SVD image codec (baseline): truncated SVD + uniform quantization.

TPU-native re-implementation of the reference SVD codec
(`lrf/compression/svd.py` in pashtari/lrf): same framework as QMF but the
factors are sqrt(s)-balanced truncated-SVD factors, min/max-quantized to the
target integer dtype with `(scale, min)` stored in metadata. Byte container
and metadata keys are format-identical, so cross-decoding with the reference
works (validated in tests on the default RGB+patch path).

Note on the reference's YCbCr+patch branch: it is broken upstream — it
assigns the whole rank tuple to `R` (`compression/svd.py:234`, crashes) and
appends `"padded size"` twice per channel (`:226` + `:237`). We implement
that branch *correctly* here (scalar per-channel rank, one padded-size entry)
and document the divergence; the reference experiments only ever exercise
RGB+patch (`experiments/comparison/eval.py:68-77`), so there is no parity
obligation on the broken path.
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
from lrf_tpu.models.qmf import _patched_mat_size, _rank_from_quality
from lrf_tpu.ops.color import rgb_to_ycbcr, ycbcr_to_rgb
from lrf_tpu.ops.pad import pad_amounts, pad_image, unpad_image
from lrf_tpu.ops.patch import depatchify, patchify
from lrf_tpu.ops.quantize import np_dequantize, quantize, to_dtype
from lrf_tpu.ops.resample import chroma_downsample, chroma_upsample, scaled_size
from lrf_tpu.ops.svd import svd_balanced_factors
from lrf_tpu.utils.transfer import to_host

__all__ = ["svd_encode", "svd_decode", "svd_rank", "svd_compression_ratio"]


def svd_rank(size: tuple[int, int], com_ratio: float) -> int:
    """Rank for a target compression ratio (`lrf/compression/svd.py:26`)."""
    num_rows, num_cols = size
    return max(math.floor(num_rows * num_cols / (com_ratio * (num_rows + num_cols))), 1)


def svd_compression_ratio(size: tuple[int, int], rank: int) -> float:
    """Compression ratio for a given rank (`lrf/compression/svd.py:44`)."""
    num_rows, num_cols = size
    return (num_rows * num_cols) / (rank * (num_rows + num_cols))


@lru_cache(maxsize=None)
def _svd_core(size, rank, patch, patch_size, quantize_dtype):
    """Jitted: image/channel -> (qu, qv, scale_u, min_u, scale_v, min_v)."""

    def run(x: jnp.ndarray):
        x = x.astype(jnp.float32)
        if patch:
            x = pad_image(x, patch_size)
            xm = patchify(x, patch_size)
        else:
            xm = x
        u, v = svd_balanced_factors(xm, rank, method="svd")
        if quantize_dtype is not None:
            qu, su, mu = quantize(u, jnp.dtype(quantize_dtype))
            qv, sv, mv = quantize(v, jnp.dtype(quantize_dtype))
            return qu, qv, su, mu, sv, mv
        return u, v

    return jax.jit(run)


def _encode_channel(x, rank, patch, patch_size, quantize_dtype):
    size = (int(x.shape[-2]), int(x.shape[-1]))
    core = _svd_core(size, rank, patch, patch_size, quantize_dtype)
    out = core(x)
    if quantize_dtype is not None:
        qu, qv, su, mu, sv, mv = out
        return (
            to_host(qu),
            to_host(qv),
            [float(su), float(mu)],
            [float(sv), float(mv)],
        )
    u, v = out
    return to_host(u), to_host(v), None, None


def svd_encode(
    image,
    rank: Optional[int | tuple[int, int, int]] = None,
    quality: Optional[float | tuple[float, float, float]] = None,
    color_space: str = "RGB",
    scale_factor: tuple[float, float] = (0.5, 0.5),
    patch: bool = True,
    patch_size: tuple[int, int] = (8, 8),
    dtype=None,
) -> bytes:
    """SVD compression of a `(3, H, W)` image (`lrf/compression/svd.py:117`).

    Defaults match the reference: RGB color space, 8x8 patches, and the
    *image's* dtype as quantization target when `dtype` is None.
    """
    assert (rank, quality) != (None, None), "Either 'rank' or 'quality' must be specified."

    image = jnp.asarray(image)
    image_dtype = np.dtype(np.asarray(image).dtype)
    qdtype = image_dtype if dtype is None else np.dtype(dtype)
    qdtype_name = None if np.issubdtype(qdtype, np.floating) else qdtype.name
    size = (int(image.shape[-2]), int(image.shape[-1]))
    patch_size = tuple(patch_size)

    metadata = {
        "dtype": image_dtype.name,
        "color space": color_space,
        "patch": patch,
    }

    if color_space == "RGB":
        if patch:
            mat_size = _patched_mat_size(size, patch_size, channels=3)
            t, b, l, r = pad_amounts(size, patch_size)
            metadata.update(
                {
                    "patch size": list(patch_size),
                    "original size": list(size),
                    "padded size": [size[0] + t + b, size[1] + l + r],
                }
            )
        else:
            mat_size = size
        R = _rank_from_quality(mat_size, quality) if rank is None else rank
        u, v, qtz_u, qtz_v = _encode_channel(image, R, patch, patch_size, qdtype_name)
        metadata["quantization"] = {"u": qtz_u, "v": qtz_v}
        factors = [u, v]

    else:  # YCbCr (correct implementation; reference branch is broken upstream)
        if not isinstance(rank, Iterable):
            rank = (None,) * 3 if rank is None else (rank, max(rank // 2, 1), max(rank // 2, 1))
        if not isinstance(quality, Iterable):
            quality = (None,) * 3 if quality is None else (quality, quality / 2, quality / 2)

        ycbcr = rgb_to_ycbcr(image.astype(jnp.float32))
        channels = chroma_downsample(ycbcr, tuple(scale_factor))
        ch_sizes = [(int(c.shape[-2]), int(c.shape[-1])) for c in channels]

        if patch:
            metadata["patch size"] = list(patch_size)
        metadata["original size"] = []
        if patch:
            metadata["padded size"] = []
        metadata["rank"] = []
        metadata["quantization"] = {"u": [], "v": []}
        factors = []
        for channel, ch_size, r_i, q_i in zip(channels, ch_sizes, rank, quality):
            if patch:
                mat_size = _patched_mat_size(ch_size, patch_size)
                t, b, l, r = pad_amounts(ch_size, patch_size)
                metadata["padded size"].append([ch_size[0] + t + b, ch_size[1] + l + r])
            else:
                mat_size = ch_size
            R = _rank_from_quality(mat_size, q_i) if r_i is None else r_i
            metadata["original size"].append(list(ch_size))
            metadata["rank"].append(R)
            x = channel if patch else channel[0]
            u, v, qtz_u, qtz_v = _encode_channel(x, R, patch, patch_size, qdtype_name)
            metadata["quantization"]["u"].append(qtz_u)
            metadata["quantization"]["v"].append(qtz_v)
            factors.extend([u, v])

    encoded_metadata = dict_to_bytes(metadata)
    encoded_factors = combine_bytes([encode_tensor(f) for f in factors])
    return combine_bytes([encoded_metadata, encoded_factors])


@lru_cache(maxsize=None)
def _svd_decoder_rgb(patch, orig_size, padded_size, patch_size, uv_shapes, out_dtype):
    def decode(u, v):
        x = jnp.matmul(u, jnp.swapaxes(v, -1, -2), preferred_element_type=jnp.float32)
        if patch:
            image = depatchify(x, padded_size, patch_size)
            image = unpad_image(image, orig_size)
        else:
            image = x
        return to_dtype(image, jnp.dtype(out_dtype))

    return jax.jit(decode)


@lru_cache(maxsize=None)
def _svd_decoder_ycbcr(patch, orig_sizes, padded_sizes, patch_size, uv_shapes, out_dtype):
    def decode(*factors):
        ycbcr = []
        for i in range(3):
            u, v = factors[2 * i], factors[2 * i + 1]
            x = jnp.matmul(u, jnp.swapaxes(v, -1, -2), preferred_element_type=jnp.float32)
            if patch:
                channel = depatchify(x, padded_sizes[i], patch_size)
                channel = unpad_image(channel, orig_sizes[i])
            else:
                # Factors are 2-D in the non-patch branch; restore the
                # channel dim. (The reference decoder would crash here —
                # 3-D input to 2-D interpolate — another latent upstream bug
                # in a branch its experiments never exercise.)
                channel = x[None]
            ycbcr.append(channel)
        image = chroma_upsample(tuple(ycbcr), size=orig_sizes[0], mode="area")
        image = ycbcr_to_rgb(image)
        return to_dtype(image, jnp.dtype(out_dtype))

    return jax.jit(decode)


def svd_decode(encoded_image: bytes) -> np.ndarray:
    """Decode an SVD stream (`lrf/compression/svd.py:297`)."""
    encoded_metadata, encoded_factors = separate_bytes(encoded_image, 2)
    metadata = bytes_to_dict(encoded_metadata)
    out_dtype = metadata["dtype"]

    if metadata["color space"] == "RGB":
        encoded_u, encoded_v = separate_bytes(encoded_factors, 2)
        u = decode_tensor(encoded_u)
        v = decode_tensor(encoded_v)
        qtz = metadata["quantization"]
        uf = u.astype(np.float32) if qtz["u"] is None else np_dequantize(u, *qtz["u"])
        vf = v.astype(np.float32) if qtz["v"] is None else np_dequantize(v, *qtz["v"])
        if metadata["patch"]:
            decoder = _svd_decoder_rgb(
                True,
                tuple(metadata["original size"]),
                tuple(metadata["padded size"]),
                tuple(metadata["patch size"]),
                (u.shape, v.shape),
                out_dtype,
            )
        else:
            decoder = _svd_decoder_rgb(False, None, None, None, (u.shape, v.shape), out_dtype)
        return to_host(decoder(jnp.asarray(uf), jnp.asarray(vf)))

    # YCbCr
    blobs = separate_bytes(encoded_factors, 6)
    raw = [decode_tensor(b) for b in blobs]
    qtz = metadata["quantization"]
    factors = []
    for i in range(3):
        u, v = raw[2 * i], raw[2 * i + 1]
        qu, qv = qtz["u"][i], qtz["v"][i]
        factors.append(u.astype(np.float32) if qu is None else np_dequantize(u, *qu))
        factors.append(v.astype(np.float32) if qv is None else np_dequantize(v, *qv))
    orig_sizes = tuple(tuple(s) for s in metadata["original size"])
    padded_sizes = (
        tuple(tuple(s) for s in metadata["padded size"]) if metadata["patch"] else None
    )
    decoder = _svd_decoder_ycbcr(
        metadata["patch"],
        orig_sizes,
        padded_sizes,
        tuple(metadata["patch size"]) if metadata["patch"] else None,
        tuple(f.shape for f in factors),
        out_dtype,
    )
    return to_host(decoder(*[jnp.asarray(f) for f in factors]))
