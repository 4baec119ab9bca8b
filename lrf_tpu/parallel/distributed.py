"""Multi-host orchestration: init, dataset sharding, ordered stream gather.

New TPU-native capability (nothing distributed exists in the reference;
SURVEY.md §2.5). Design per the JAX multi-host recipe:

- each process calls `initialize()` (`jax.distributed.initialize`), then
  encodes its contiguous slice of the dataset on its local devices;
- encoded streams are variable-length bytes, so the gather is two-phase:
  an all-gather of the per-image length table, then an all-gather of
  zero-padded payload buffers, reassembled **in original dataset order** on
  every host (host 0 writes them out). Collectives ride ICI within a slice
  and DCN across slices; payload gather uses one fused all-gather rather
  than per-image sends.

Single-process runs degrade gracefully: `process_count() == 1` makes every
gather a no-op, which is how the unit tests exercise this path.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import numpy as np

__all__ = [
    "initialize",
    "process_count",
    "process_index",
    "shard_range",
    "allgather_bytes",
    "distributed_encode",
]


def initialize(**kwargs) -> None:
    """Initialize jax.distributed (no-op if already initialized / 1 process)."""
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError:
        pass  # already initialized


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def shard_range(n_items: int, index: Optional[int] = None, count: Optional[int] = None):
    """Contiguous [start, end) slice of a dataset for this process.

    Uses the balanced split: first `n % count` processes get one extra item,
    so dataset order is preserved under concatenation-by-process-index.
    """
    index = process_index() if index is None else index
    count = process_count() if count is None else count
    base, extra = divmod(n_items, count)
    start = index * base + min(index, extra)
    end = start + base + (1 if index < extra else 0)
    return start, end


def allgather_bytes(local_blobs: Sequence[bytes]) -> list[bytes]:
    """All-gather variable-length byte blobs across processes, order-preserving.

    Two-phase: (1) all-gather a per-process (count, max_len) table;
    (2) all-gather zero-padded uint8 payload buffers; trim and concatenate in
    process order. With one process this is the identity.
    """
    if process_count() == 1:
        return list(local_blobs)

    from jax.experimental import multihost_utils

    local_lens = np.asarray([len(b) for b in local_blobs], dtype=np.int64)
    # (1) gather counts then lengths (padded to max count)
    counts = multihost_utils.process_allgather(np.asarray([len(local_blobs)], np.int64))
    counts = np.asarray(counts).reshape(-1)
    max_count = int(counts.max())
    lens_padded = np.zeros(max_count, dtype=np.int64)
    lens_padded[: len(local_lens)] = local_lens
    all_lens = np.asarray(multihost_utils.process_allgather(lens_padded))
    all_lens = all_lens.reshape(jax.process_count(), max_count)
    # (2) gather payloads, each padded to the global max length
    max_len = int(all_lens.max()) if all_lens.size else 0
    payload = np.zeros((max_count, max_len), dtype=np.uint8)
    for i, b in enumerate(local_blobs):
        payload[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
    gathered = np.asarray(multihost_utils.process_allgather(payload))
    gathered = gathered.reshape(jax.process_count(), max_count, max_len)

    out: list[bytes] = []
    for p in range(jax.process_count()):
        for i in range(int(counts[p])):
            out.append(gathered[p, i, : int(all_lens[p, i])].tobytes())
    return out


def distributed_encode(
    images: np.ndarray,
    encode_batch: Callable[[np.ndarray], list[bytes]],
) -> list[bytes]:
    """Data-parallel dataset encode with ordered gather.

    `images`: the full `(N, 3, H, W)` dataset (every process sees the same
    array or a memory-mapped equivalent). Each process encodes its contiguous
    shard on local devices via `encode_batch`, then streams are all-gathered
    in dataset order. Returns the full ordered list on every process.
    """
    start, end = shard_range(len(images))
    local = encode_batch(images[start:end]) if end > start else []
    return allgather_bytes(local)
