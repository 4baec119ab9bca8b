"""Evaluation harness: per-image compression metrics with wall-clock timing.

Equivalent of the reference `eval_compression` (`lrf/utils/misc.py:59` in
pashtari/lrf), which defines every published number. Differences by design:
timing uses `time.perf_counter` around the encoder/decoder call with
`jax.block_until_ready` on device outputs (the reference uses pyinstrument's
profiler session duration); output dict keys are identical so the reference
plotting pipeline can consume our results JSON directly.
"""

from __future__ import annotations

import time
from typing import Any, Callable

import numpy as np

from lrf_tpu.utils.metrics import bits_per_pixel, compression_ratio, psnr, ssim

__all__ = ["eval_compression", "read_image"]


def read_image(path: str) -> np.ndarray:
    """Read an image file to a `(C, H, W)` uint8 array (`utils/misc.py:124`)."""
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB")).transpose(2, 0, 1)


def _block(x):
    try:
        import jax

        jax.block_until_ready(x)
    except Exception:
        pass
    return x


def eval_compression(
    image: Any,
    encoder: Callable,
    decoder: Callable,
    reconstruct: bool = False,
    **kwargs,
) -> dict:
    """Compression metrics for one image (`lrf/utils/misc.py:59`).

    Returns the same keys as the reference: "compression ratio",
    "bit rate (bpp)", "PSNR (dB)", "SSIM", "encoding time (ms)",
    "decoding time (ms)" (+ "reconstructed" when requested).
    """
    if isinstance(image, str):
        image = read_image(image)
    image = np.asarray(image)
    if image.ndim == 3 and image.shape[0] not in (1, 3) and image.shape[-1] in (1, 3):
        image = image.transpose(2, 0, 1)

    t0 = time.perf_counter()
    encoded = _block(encoder(image, **kwargs))
    encoding_time = 1000 * (time.perf_counter() - t0)

    t0 = time.perf_counter()
    reconstructed = _block(decoder(encoded))
    decoding_time = 1000 * (time.perf_counter() - t0)

    try:
        import jax

        platform = jax.default_backend()
    except Exception:  # pragma: no cover
        platform = "unknown"
    output = {
        "compression ratio": float(compression_ratio(image, encoded)),
        "bit rate (bpp)": float(bits_per_pixel(image.shape[-2:], encoded)),
        "PSNR (dB)": float(psnr(image, reconstructed)),
        "SSIM": float(ssim(image, reconstructed)),
        "encoding time (ms)": encoding_time,
        "decoding time (ms)": decoding_time,
        # which backend produced the timing columns (the RD columns are
        # platform-independent); the reference measured CPU only
        "platform": platform,
    }
    if reconstruct:
        output["reconstructed"] = reconstructed
    return output
