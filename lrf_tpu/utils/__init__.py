"""Metrics, IO, eval harness, plotting."""

from lrf_tpu.utils.metrics import (
    mae,
    mse,
    relative_error,
    psnr,
    ssim,
    get_memory_usage,
    compression_ratio,
    bits_per_pixel,
)
