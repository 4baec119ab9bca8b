"""Multi-host orchestration: init, dataset sharding, ordered stream gather.

New TPU-native capability (nothing distributed exists in the reference;
SURVEY.md §2.5). Design per the JAX multi-host recipe:

- each process calls `initialize()` (`jax.distributed.initialize`), then
  encodes its contiguous slice of the dataset on its local devices;
- encoded streams are variable-length bytes, so the gather is two-phase:
  an all-gather of the per-image length table, then a **ragged payload
  gather in bounded fixed-size rounds** (each process's blobs flattened to
  one contiguous buffer; peak gather memory `P x chunk` per round, not
  `P x count x max_len`), reassembled **in original dataset order** on
  every host (host 0 writes them out). Collectives ride ICI within a slice
  and DCN across slices.

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


def allgather_bytes(
    local_blobs: Sequence[bytes], chunk_bytes: int = 8 * 1024 * 1024
) -> list[bytes]:
    """All-gather variable-length byte blobs across processes, order-preserving.

    Ragged gather in bounded rounds: (1) all-gather the per-process blob
    count + length table; (2) each process flattens its blobs into ONE
    contiguous payload and the payloads are all-gathered in fixed-size
    `chunk_bytes` rounds — peak gather buffer is `P x chunk_bytes` per round
    regardless of dataset size (a dense `P x max_count x max_len` gather
    would be memory-hostile for e.g. CLIC at high quality across many
    hosts). Rounds = ceil(max_total / chunk); processes whose payload is
    exhausted contribute zero padding. With one process this is the identity.
    """
    if process_count() == 1:
        return list(local_blobs)

    from jax.experimental import multihost_utils

    p_count = jax.process_count()
    local_lens = np.asarray([len(b) for b in local_blobs], dtype=np.int64)
    # (1) two gathers bound the length table: a tiny count-only gather
    # first establishes max_count, then a max_count-padded gather carries
    # each process's per-blob length table.
    counts = multihost_utils.process_allgather(
        np.asarray([len(local_blobs)], np.int64)
    )
    counts = np.asarray(counts).reshape(-1)
    max_count = int(counts.max())
    lens_padded = np.zeros(max_count, dtype=np.int64)
    lens_padded[: len(local_lens)] = local_lens
    all_lens = np.asarray(multihost_utils.process_allgather(lens_padded))
    all_lens = all_lens.reshape(p_count, max_count)

    # (2) flat local payload, gathered in bounded rounds
    totals = all_lens.sum(axis=1)
    max_total = int(totals.max()) if totals.size else 0
    n_rounds = max(1, -(-max_total // chunk_bytes)) if max_total else 0
    flat = bytearray().join(local_blobs) if local_blobs else b""
    flat = np.frombuffer(bytes(flat), dtype=np.uint8)
    payloads = [bytearray() for _ in range(p_count)]
    for r in range(n_rounds):
        lo = r * chunk_bytes
        piece = np.zeros(chunk_bytes, dtype=np.uint8)
        part = flat[lo : lo + chunk_bytes]
        piece[: len(part)] = part
        gathered = np.asarray(multihost_utils.process_allgather(piece))
        gathered = gathered.reshape(p_count, chunk_bytes)
        for p in range(p_count):
            need = int(totals[p]) - lo
            if need > 0:
                payloads[p] += gathered[p, : min(need, chunk_bytes)].tobytes()

    out: list[bytes] = []
    for p in range(p_count):
        off = 0
        buf = payloads[p]
        for i in range(int(counts[p])):
            n = int(all_lens[p, i])
            out.append(bytes(buf[off : off + n]))
            off += n
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
