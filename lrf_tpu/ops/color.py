"""Color-space transforms (full-range BT.601 RGB <-> YCbCr).

TPU-native reimplementation of the reference color transforms
(`lrf/compression/utils.py:24-73` in pashtari/lrf): a 3x3 channel mix expressed
as a single einsum so XLA fuses it with neighbouring elementwise work. Operates
on `(..., 3, H, W)` arrays; fully jittable.
"""

from __future__ import annotations

import jax.numpy as jnp

# Exact full-range BT.601 constants used by the reference
# (`lrf/compression/utils.py:35` and `:61`).
_RGB_TO_YCBCR = (
    (0.299, 0.587, 0.114),
    (-0.168736, -0.331264, 0.5),
    (0.5, -0.418688, -0.081312),
)
_YCBCR_TO_RGB = (
    (1.0, 0.0, 1.40200),
    (1.0, -0.344136, -0.714136),
    (1.0, 1.77200, 0.0),
)
_YCBCR_OFFSET = (0.0, 128.0, 128.0)


def rgb_to_ycbcr(rgb: jnp.ndarray) -> jnp.ndarray:
    """Convert an RGB image `(..., 3, H, W)` to full-range YCbCr.

    Matches reference `rgb_to_ycbcr` (`lrf/compression/utils.py:24`):
    ``ycbcr = offset + M @ rgb`` with the BT.601 matrix above.
    """
    m = jnp.asarray(_RGB_TO_YCBCR, dtype=jnp.float32)
    offset = jnp.asarray(_YCBCR_OFFSET, dtype=jnp.float32).reshape(3, 1, 1)
    return offset + jnp.einsum("ij,...jhw->...ihw", m, rgb.astype(jnp.float32))


def ycbcr_to_rgb(ycbcr: jnp.ndarray) -> jnp.ndarray:
    """Convert a full-range YCbCr image `(..., 3, H, W)` to RGB.

    Matches reference `ycbcr_to_rgb` (`lrf/compression/utils.py:50`):
    ``rgb = M_inv @ (ycbcr - offset)``.
    """
    m = jnp.asarray(_YCBCR_TO_RGB, dtype=jnp.float32)
    offset = jnp.asarray(_YCBCR_OFFSET, dtype=jnp.float32).reshape(3, 1, 1)
    return jnp.einsum("ij,...jhw->...ihw", m, ycbcr.astype(jnp.float32) - offset)
