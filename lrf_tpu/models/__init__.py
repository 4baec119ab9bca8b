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
)
from lrf_tpu.models.qmf import qmf_encode, qmf_decode, qmf_rank
