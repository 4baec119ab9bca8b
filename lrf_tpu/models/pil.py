"""PIL codec wrapper (JPEG/PNG/WebP baselines).

Equivalent of `lrf/compression/pil.py` in pashtari/lrf: thin host-side
wrappers turning `(C, H, W)` arrays into encoded bytes via PIL and back.
Used by the comparison experiments as the JPEG baseline.
"""

from __future__ import annotations

import io

import numpy as np

__all__ = ["pil_encode", "pil_decode"]


def pil_encode(image, **kwargs) -> bytes:
    """Encode a `(C, H, W)` uint8 array with PIL (`lrf/compression/pil.py:8`).

    kwargs go to `PIL.Image.save` (e.g. ``format="JPEG", quality=50``).
    """
    from PIL import Image

    arr = np.asarray(image)
    if arr.ndim == 3:
        arr = arr.transpose(1, 2, 0)
    pil_image = Image.fromarray(arr)
    buffer = io.BytesIO()
    pil_image.save(buffer, **kwargs)
    return buffer.getvalue()


def pil_decode(encoded_image: bytes) -> np.ndarray:
    """Decode bytes to a `(C, H, W)` uint8 array (`lrf/compression/pil.py:26`)."""
    from PIL import Image

    pil_image = Image.open(io.BytesIO(encoded_image))
    arr = np.asarray(pil_image)
    if arr.ndim == 3:
        arr = arr.transpose(2, 0, 1)
    return arr
