"""Chunked device-to-host transfers.

The axon TPU tunnel in this environment hangs on single D2H transfers larger
than ~1 MiB (empirically: 1.0 MiB OK, 1.5 MiB deadlocks; H2D uploads of tens
of MiB are fine). `to_host` fetches large arrays as contiguous slices along
axis 0 — prefix slices preserve the on-device tiled layout, so the slice
programs compile in well under a second (a `ravel`-based chunker instead
triggers a 30-40 s relayout compile for TPU-tiled int8 shapes) and each
sub-1-MiB fetch completes in ~10 ms. Measured: 1.9 MiB int8 factor tensor in
0.15 s steady-state, 7.6 MiB float32 in 0.85 s.

Set `LRF_TPU_FETCH_CHUNK=0` to disable chunking (healthy local runtimes).
"""

from __future__ import annotations

import os

import numpy as np

_CHUNK = int(os.environ.get("LRF_TPU_FETCH_CHUNK", str(256 * 1024)))


def _gather_async(slices) -> list[np.ndarray]:
    """Materialize device slices via overlapped transfers.

    `copy_to_host_async` on every slice before the first blocking
    `np.asarray` lets the transport pipeline the copies; on the tunnel
    transport this measures ~3x the throughput of sequential synchronous
    fetches (22 vs 8 MB/s on 256 KiB chunks).
    """
    for s in slices:
        try:
            s.copy_to_host_async()
        except AttributeError:  # non-jax arrays
            break
    return [np.asarray(s) for s in slices]


def _fetch_chunked(x, chunk_bytes: int) -> np.ndarray:
    n = x.shape[0] if x.ndim else 0
    row_bytes = (x.size // max(n, 1)) * x.dtype.itemsize if n else 0
    if x.ndim == 0 or n == 0:
        return np.asarray(x)
    if row_bytes > chunk_bytes:
        if x.ndim == 1:
            # contiguous ranges of a 1-D array
            elems = max(1, chunk_bytes // x.dtype.itemsize)
            slices = [x[i : i + elems] for i in range(0, n, elems)]
            return np.concatenate(_gather_async(slices))
        return np.stack([_fetch_chunked(x[i], chunk_bytes) for i in range(n)])
    rows = max(1, chunk_bytes // max(row_bytes, 1))
    slices = [x[i : i + rows] for i in range(0, n, rows)]
    return np.concatenate(_gather_async(slices), axis=0)


def to_host(x) -> np.ndarray:
    """Fetch a (possibly device-resident) array to host memory, chunked."""
    if isinstance(x, np.ndarray):
        return x
    try:
        import jax
    except ImportError:  # pragma: no cover
        return np.asarray(x)
    if not isinstance(x, jax.Array):
        return np.asarray(x)
    nbytes = x.size * x.dtype.itemsize
    if _CHUNK <= 0 or nbytes <= _CHUNK:
        return np.asarray(x)
    # CPU-backed arrays don't cross the tunnel; fetch directly.
    platform = next(iter(x.devices())).platform
    if platform == "cpu":
        return np.asarray(x)
    return _fetch_chunked(x, _CHUNK)


def tree_to_host(tree):
    """`to_host` over an arbitrary pytree (tuples/lists/dicts of arrays)."""
    if isinstance(tree, (list, tuple)):
        return type(tree)(tree_to_host(t) for t in tree)
    if isinstance(tree, dict):
        return {k: tree_to_host(v) for k, v in tree.items()}
    return to_host(tree)
