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
from lrf_tpu.utils.eval import eval_compression, read_image
from lrf_tpu.utils.config import read_config, save_config, json_serializer
from lrf_tpu.utils.transfer import to_host, tree_to_host
from lrf_tpu.utils.plotting import LOESS, Plot
from lrf_tpu.utils.viz import (
    vis_image,
    vis_image_batch,
    vis_collage,
    zscore_normalize,
    minmax_normalize,
)
