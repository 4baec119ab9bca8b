"""Device-mesh helpers for the distributed codec.

The reference is single-process/single-device (SURVEY.md §2.5); this layer is
new, TPU-first capability. The codec's two scaling axes map onto a 2-D mesh:

- ``data``: independent images of a batch (data parallelism, the dominant
  axis for dataset encoding);
- ``patch``: rows of the per-channel patch-stack matrix within one image
  (spatial-block parallelism for very large images — the codec's analog of
  sequence parallelism). Cross-shard reductions (``V^T V``, ``X^T U``) ride
  ICI via XLA-inserted collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: Optional[int] = None,
    patch: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a `(data, patch)` mesh over the given (default: all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // patch
    assert data * patch == n, f"mesh {data}x{patch} != {n} devices"
    dev_array = np.asarray(devices).reshape(data, patch)
    return Mesh(dev_array, axis_names=("data", "patch"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for an image batch `(B, C, H, W)`: B split over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
