"""lrf_tpu: TPU-native low-rank-factorization image codec framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of pashtari/lrf
(quantization-aware matrix factorization image compression), built TPU-first:
jitted end-to-end encode/decode pipelines, MXU-shaped batched factorization
kernels, device-mesh data-parallel batch encoding, and a byte-format
compatible bitstream container.

The public API mirrors the reference's flat namespace (`lrf/__init__.py`):
``lrf_tpu.qmf_encode(...)``, ``lrf_tpu.psnr(...)``, etc.
"""

from lrf_tpu.ops import *  # noqa: F401,F403
from lrf_tpu.models import *  # noqa: F401,F403
from lrf_tpu.utils import *  # noqa: F401,F403

__version__ = "0.1.0"
