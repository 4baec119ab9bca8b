"""Jittable numeric ops: transforms, resampling, factorization kernels."""

from lrf_tpu.ops.color import rgb_to_ycbcr, ycbcr_to_rgb
from lrf_tpu.ops.resample import (
    area_resize,
    nearest_resize,
    chroma_downsample,
    chroma_downsampling,
    chroma_upsample,
    chroma_upsampling,
    scaled_size,
)
from lrf_tpu.ops.pad import pad_image, unpad_image, pad_amounts
from lrf_tpu.ops.patch import patchify, depatchify, patchify_uv, depatchify_uv
from lrf_tpu.ops.quantize import quantize, dequantize, to_dtype, np_dequantize
from lrf_tpu.ops.common import prod, relative_error, safe_divide, soft_thresholding
from lrf_tpu.ops.svd import truncated_svd, svd_balanced_factors
from lrf_tpu.ops.hosvd import (
    unfold,
    mode_product,
    multi_mode_product,
    batched_multi_mode_product,
    hosvd,
    batched_hosvd,
    hosvd_rank_upper_bounds,
    hosvd_rank_feasible_ranges,
)
from lrf_tpu.ops.tt import (
    ttd,
    batched_ttd,
    contract_tt,
    batched_contract_tt,
    tt_rank_upper_bounds,
    tt_rank_feasible_ranges,
)
from lrf_tpu.ops.modules import RandInit, SVDInit, CoordinateDescent, QMF, HOSVD
from lrf_tpu.ops.bcd_pallas import bcd_pallas, qmf_decompose_pallas
from lrf_tpu.ops.bcd import (
    qmf_decompose,
    qmf_reconstruct,
    qmf_loss,
    svd_init,
    bcd_sweep,
    update_columns,
    update_w,
    make_project,
)
