"""Codec layer: QMF/SVD/HOSVD/TT/PIL codecs + bitstream container."""

from lrf_tpu.models.container import (
    combine_bytes,
    separate_bytes,
    dict_to_bytes,
    bytes_to_dict,
    encode_matrix,
    decode_matrix,
    encode_tensor,
    decode_tensor,
    set_fiber_coder,
    get_fiber_coder,
)
from lrf_tpu.models.qmf import qmf_encode, qmf_decode, qmf_rank
from lrf_tpu.models.svd import svd_encode, svd_decode, svd_rank, svd_compression_ratio
from lrf_tpu.models.hosvd import (
    hosvd_encode,
    hosvd_decode,
    hosvd_rank,
    hosvd_compression_ratio,
    patch_hosvd_encode,
    patch_hosvd_decode,
    patch_hosvd_optimal_rank,
    patch_hosvd_tensorize,
    patch_hosvd_detensorize,
)
from lrf_tpu.models.pil import pil_encode, pil_decode
