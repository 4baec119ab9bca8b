"""Bitstream container: length-prefixed framing + per-fiber zlib coding.

Byte-format compatible with the reference container
(`lrf/compression/utils.py:246-490` in pashtari/lrf):

- `combine_bytes` left-folds payloads as
  ``len(p1) as 4-byte big-endian || p1 || p2``; `separate_bytes` peels in
  reverse.
- metadata is a UTF-8 JSON dict.
- 2-D tensors are split into columns ("fibers"); each fiber's raw bytes are
  zlib-compressed at level 9 separately, with inner metadata
  ``{"num_fibers", "mode", "dtype"}``. N-D tensors are whole-buffer
  zlib level 9 with ``{"shape", "dtype"}`` metadata.

This layer is host-side by design (DEFLATE is inherently serial); the hot
per-column loop can be offloaded to the native C++ coder in
`lrf_tpu/native` (thread-pooled) when built, with identical bytes.
Streams produced here decode with the reference decoder and vice versa.

Three fiber-compressor backends (`set_fiber_coder`):

- ``"best"`` (default): per fiber, the smaller of `zlib.compress(f, 9)`
  and libdeflate level 12 — measured 9-12% smaller streams than the
  reference's zlib-9 on QMF factor fibers, which is what makes
  "payload <= reference" hold strictly (kodim01_parity.json). Both
  candidates are standard zlib streams, so the reference decoder reads
  the result unchanged. Falls back to plain zlib-9 when the native
  library isn't built.
- ``"zlib"``: byte output identical to the reference's
  `zlib.compress(fiber, 9)` — the strict byte-parity contract.
- ``"deflate"``: libdeflate via the native coder — ~4-5x faster at
  equal-or-smaller total size on factor data (measured 98.4% of zlib-9's
  bytes at 4.7x its speed at level 6); the throughput-path choice
  (bench.py). Output is still a standard zlib stream. Falls back to
  "zlib" when the native library isn't built.
"""

from __future__ import annotations

import functools
import json
import zlib
from typing import Optional, Sequence

import numpy as np

from lrf_tpu.native import fibercodec as _native

_FIBER_CODER: dict = {"backend": "best", "level": 0}
# "best" ignores its level: it always races zlib-9 against libdeflate-12.
_DEFAULT_LEVELS = {"zlib": 9, "deflate": 6, "best": 0}


def set_fiber_coder(backend: str = "zlib", level: Optional[int] = None) -> None:
    """Set the process-wide default fiber compressor (see module docstring)."""
    assert backend in _DEFAULT_LEVELS, f"unknown coder backend {backend!r}"
    _FIBER_CODER["backend"] = backend
    _FIBER_CODER["level"] = _DEFAULT_LEVELS[backend] if level is None else level


def get_fiber_coder() -> tuple[str, int]:
    return _FIBER_CODER["backend"], _FIBER_CODER["level"]


def _resolve_coder(coder) -> tuple[str, int]:
    """None -> process default; str -> backend at its default level."""
    if coder is None:
        return get_fiber_coder()
    if isinstance(coder, str):
        return coder, _DEFAULT_LEVELS[coder]
    backend, level = coder
    return backend, _DEFAULT_LEVELS[backend] if level is None else level


def _compress_fibers(matrix, mode: str, level: int, backend: str):
    """Native fiber compression with the "best" race; None if no native lib.

    "best": every fiber is compressed with both zlib-9 (the reference's
    exact coder) and libdeflate level 12, and the smaller blob wins (ties
    go to zlib for byte-determinism across builds). Both are standard zlib
    streams; the winner is what guarantees payload <= the reference's
    zlib-9 output for the same data.
    """
    if backend != "best":
        return _native.compress_fibers(matrix, mode, level, backend)
    blobs_z = _native.compress_fibers(matrix, mode, 9, "zlib")
    if blobs_z is None:
        return None
    blobs_d = _native.compress_fibers(matrix, mode, 12, "deflate")
    if blobs_d is None:
        return blobs_z
    return [z if len(z) <= len(d) else d for z, d in zip(blobs_z, blobs_d)]


def _combine_two(payload1: bytes, payload2: bytes) -> bytes:
    if len(payload1) > 0xFFFFFFFF:
        raise ValueError("payload1 is too large to encode.")
    return len(payload1).to_bytes(4, byteorder="big") + payload1 + payload2


def _separate_two(combined: bytes) -> tuple[bytes, bytes]:
    if len(combined) < 4:
        raise ValueError("Combined data is too short to decode.")
    n = int.from_bytes(combined[:4], byteorder="big")
    return combined[4 : 4 + n], combined[4 + n :]


def combine_bytes(payloads: Sequence[bytes]) -> bytes:
    """Left-fold payloads into one framed stream (`compression/utils.py:290`)."""
    return functools.reduce(_combine_two, payloads)


def separate_bytes(combined: bytes, num_payloads: int = 2) -> tuple[bytes, ...]:
    """Split a framed stream back into payloads (`compression/utils.py:303`)."""
    payloads: list[bytes] = []
    head = combined
    for _ in range(num_payloads - 1):
        head, tail = _separate_two(head)
        payloads.insert(0, tail)
    payloads.insert(0, head)
    return tuple(payloads)


def dict_to_bytes(d: dict) -> bytes:
    return json.dumps(d).encode("utf-8")


def bytes_to_dict(b: bytes) -> dict:
    return json.loads(b.decode("utf-8"))


def encode_matrix(matrix: np.ndarray, mode: str = "col", coder=None) -> bytes:
    """Per-fiber DEFLATE coding of a 2-D array (`compression/utils.py:354`).

    The default ``coder`` ("best" unless `set_fiber_coder` changed it) emits
    per fiber the smaller of zlib-9 and libdeflate-12 — always <= the
    reference's per-column `zlib.compress(f, 9)` bytes for the same data.
    With ``coder="zlib"`` the bytes are identical to the reference's.
    """
    assert matrix.ndim == 2, "'matrix' must be 2-D."
    assert mode in ("col", "row"), "'mode' must be 'col' or 'row'."
    matrix = np.ascontiguousarray(matrix)
    backend, level = _resolve_coder(coder)

    num_fibers = matrix.shape[1] if mode == "col" else matrix.shape[0]
    encoded_fibers = _compress_fibers(matrix, mode, level, backend)
    if encoded_fibers is None:  # native coder unavailable: pure-Python path
        # (CPython has no libdeflate; "deflate"/"best" degrade to zlib-9 —
        # still a valid stream, just not byte-deterministic across that
        # fallback.)
        if mode == "col":
            fibers = [matrix[:, i : i + 1] for i in range(num_fibers)]
        else:
            fibers = [matrix[i : i + 1, :] for i in range(num_fibers)]
        lvl = level if backend == "zlib" else 9
        encoded_fibers = [
            zlib.compress(np.ascontiguousarray(f).tobytes(), lvl) for f in fibers
        ]

    metadata = {
        "num_fibers": num_fibers,
        "mode": mode,
        "dtype": matrix.dtype.name,
    }
    return combine_bytes([dict_to_bytes(metadata), combine_bytes(encoded_fibers)])


def decode_matrix(encoded_matrix: bytes) -> np.ndarray:
    """Inverse of `encode_matrix` (`compression/utils.py:393`)."""
    encoded_metadata, encoded_fibers = separate_bytes(encoded_matrix)
    metadata = bytes_to_dict(encoded_metadata)
    num_fibers = metadata["num_fibers"]
    mode = metadata["mode"]
    dtype = np.dtype(metadata["dtype"])

    fiber_blobs = separate_bytes(encoded_fibers, num_payloads=num_fibers)
    decoded = _native.decompress_fibers(fiber_blobs, dtype, mode)
    if decoded is not None:
        return decoded
    fibers = [np.frombuffer(zlib.decompress(blob), dtype=dtype) for blob in fiber_blobs]
    axis = 1 if mode == "col" else 0
    return np.stack(fibers, axis=axis)


def decode_matrix_batch(encoded_matrices: Sequence[bytes]) -> np.ndarray:
    """Batched inverse of `encode_matrix` over same-shape streams.

    Returns a `(B, M, N)` stack. All B streams' fibers inflate in ONE native
    thread-pooled call (per-stream `decode_matrix` pays a pool round trip per
    image); bytes-level semantics identical to `decode_matrix` per element.
    """
    per_stream = []
    num_fibers = mode = dtype = None
    for blob in encoded_matrices:
        encoded_metadata, encoded_fibers = separate_bytes(blob)
        metadata = bytes_to_dict(encoded_metadata)
        if num_fibers is None:
            num_fibers = metadata["num_fibers"]
            mode = metadata["mode"]
            dtype = np.dtype(metadata["dtype"])
        else:
            assert (
                metadata["num_fibers"] == num_fibers
                and metadata["mode"] == mode
                and np.dtype(metadata["dtype"]) == dtype
            ), "decode_matrix_batch requires homogeneous streams"
        per_stream.append(separate_bytes(encoded_fibers, num_payloads=num_fibers))

    all_blobs = [f for fibers in per_stream for f in fibers]
    decoded = _native.decompress_fibers(all_blobs, dtype, "row")
    if decoded is None:
        return np.stack([decode_matrix(b) for b in encoded_matrices])
    b = len(per_stream)
    fibers = decoded.reshape(b, num_fibers, -1)
    return fibers.transpose(0, 2, 1) if mode == "col" else fibers


def encode_matrix_batch(
    tensors: np.ndarray, mode: str = "col", coder=None
) -> list[bytes]:
    """Per-image `encode_matrix` over a `(B, M, N)` stack, one native call.

    Output bytes are identical to ``[encode_matrix(t, mode, coder) for t in
    tensors]``; with the native coder built, all B*N fibers deflate in a
    single thread-pooled call instead of B separate ones.
    """
    assert tensors.ndim == 3
    b, m, n = tensors.shape
    num_fibers = n if mode == "col" else m
    per = n if mode == "col" else m
    backend, level = _resolve_coder(coder)

    block = (
        np.ascontiguousarray(tensors.transpose(0, 2, 1)).reshape(b * n, m)
        if mode == "col"
        else np.ascontiguousarray(tensors).reshape(b * m, n)
    )
    blobs = _compress_fibers(block, "row", level, backend)
    if blobs is None:
        return [encode_matrix(t, mode, coder) for t in tensors]

    metadata = {
        "num_fibers": num_fibers,
        "mode": mode,
        "dtype": tensors.dtype.name,
    }
    encoded_metadata = dict_to_bytes(metadata)
    out = []
    for i in range(b):
        fibers = blobs[i * per : (i + 1) * per]
        out.append(combine_bytes([encoded_metadata, combine_bytes(fibers)]))
    return out


def encode_tensor_batch(tensors: np.ndarray, coder=None) -> list[bytes]:
    """Per-image `encode_tensor` over a stack: `(B, M, N)` -> matrix coder,
    higher-rank -> per-image whole-buffer zlib. Bytes identical to the
    unbatched calls."""
    tensors = np.asarray(tensors)
    if tensors.ndim == 3:
        return encode_matrix_batch(tensors, coder=coder)
    return [encode_tensor(t, coder=coder) for t in tensors]


def encode_tensor(tensor: np.ndarray, coder=None) -> bytes:
    """2-D -> `encode_matrix`; N-D -> whole-buffer zlib (`compression/utils.py:429`)."""
    tensor = np.asarray(tensor)
    if tensor.ndim == 2:
        return encode_matrix(tensor, coder=coder)
    backend, level = _resolve_coder(coder)
    raw = np.ascontiguousarray(tensor)
    payload = None
    if backend in ("deflate", "best"):
        # "best" already races zlib-9 against libdeflate-12 inside
        # _compress_fibers; no host-side re-race needed.
        blobs = _compress_fibers(raw.reshape(1, -1), "row", level, backend)
        if blobs is not None:
            payload = blobs[0]
    if payload is None:
        payload = zlib.compress(raw.tobytes(), level if backend == "zlib" else 9)
    metadata = {"shape": list(tensor.shape), "dtype": tensor.dtype.name}
    return combine_bytes([dict_to_bytes(metadata), payload])


def decode_tensor(encoded_tensor: bytes) -> np.ndarray:
    """Inverse of `encode_tensor` (`compression/utils.py:458`)."""
    encoded_metadata, payload = separate_bytes(encoded_tensor)
    metadata = bytes_to_dict(encoded_metadata)
    if "num_fibers" in metadata:
        return decode_matrix(encoded_tensor)
    shape = metadata["shape"]
    dtype = np.dtype(metadata["dtype"])
    return np.frombuffer(zlib.decompress(payload), dtype=dtype).reshape(shape)
