"""ctypes bindings for the native (C++) fiber codec.

The reference compresses every factor column with a separate Python-level
zlib call (`lrf/compression/utils.py:374-378` in pashtari/lrf). That loop is
pure serialization overhead; here it is offloaded to `libfibercodec.so`
(built from `fibercodec.cpp`, see Makefile), which splits the matrix into
fibers and runs zlib level-9 per fiber on a C++ thread pool. Output bytes are
identical to the Python path (same zlib), verified in tests.

If the shared library has not been built, `compress_fibers`/
`decompress_fibers` return None and callers fall back to pure Python.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Sequence

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libfibercodec.so")
_lib = None


_build_attempted = False


def _try_build() -> None:
    """Best-effort `make` of the shared library (it is gitignored, so fresh
    checkouts don't have it and would silently lose the native fast path).

    Failures are surfaced as a one-time `RuntimeWarning` carrying the build
    stderr tail — callers still fall back to pure Python, but a broken
    toolchain no longer loses the fast path silently. The Makefile builds to
    a temp name and renames into place, so concurrent builders never dlopen
    a half-written .so.
    """
    global _build_attempted
    if _build_attempted or os.environ.get("LRF_TPU_NO_NATIVE_BUILD"):
        return
    _build_attempted = True
    import subprocess
    import warnings

    try:
        proc = subprocess.run(
            ["make", "-C", os.path.dirname(_LIB_PATH)],
            check=False,
            capture_output=True,
            timeout=120,
        )
        if proc.returncode != 0:
            tail = proc.stderr.decode(errors="replace")[-500:]
            warnings.warn(
                "native fiber codec build failed (falling back to the "
                f"pure-Python coder):\n{tail}",
                RuntimeWarning,
                stacklevel=2,
            )
    except Exception as exc:
        warnings.warn(
            "native fiber codec build failed (falling back to the "
            f"pure-Python coder): {exc!r}",
            RuntimeWarning,
            stacklevel=2,
        )


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        _try_build()
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    # int compress_fibers2(const uint8_t* data, int64_t num_fibers,
    #                      int64_t fiber_bytes, int level, int backend,
    #                      uint8_t* out, int64_t out_capacity_per_fiber,
    #                      int64_t* out_lens)
    lib.lrf_compress_fibers2.restype = ctypes.c_int
    lib.lrf_compress_fibers2.argtypes = [
        ctypes.c_void_p,  # raw fiber block (numpy pointer, no bytes copy)
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
    ]
    # int decompress_fibers(const uint8_t* blobs, const int64_t* blob_lens,
    #                       int64_t num_fibers, uint8_t* out,
    #                       int64_t fiber_bytes)
    lib.lrf_decompress_fibers.restype = ctypes.c_int
    lib.lrf_decompress_fibers.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
    ]
    # int dpack_decode_segments(const uint8_t* main, const uint8_t* exc,
    #     int64_t n_exc_rows, const int64_t* seg_row_base,
    #     const int64_t* seg_values, const int64_t* seg_ranks,
    #     int64_t num_segments, const int32_t* lens, const uint32_t* codes,
    #     int64_t alphabet, int64_t chunk, int64_t main_words,
    #     int64_t row_words, int64_t max_len, int8_t* out)
    try:
        lib.lrf_dpack_decode_segments.restype = ctypes.c_int
        lib.lrf_dpack_decode_segments.argtypes = [
            ctypes.c_void_p,  # main stream (numpy pointer)
            ctypes.c_void_p,  # continuation rows (numpy pointer)
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int8),
        ]
    except AttributeError:  # stale .so from before the dpack coder
        pass
    try:
        lib.lrf_pack_values.restype = ctypes.c_int
        lib.lrf_pack_values.argtypes = [
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint32),
        ]
    except AttributeError:  # stale .so from before the pack fast path
        pass
    try:
        lib.lrf_assemble_streams.restype = ctypes.c_int
        lib.lrf_assemble_streams.argtypes = [
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,  # per-fiber blob capacity
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.lrf_dpack_assemble_streams.restype = ctypes.c_int
        lib.lrf_dpack_assemble_streams.argtypes = [
            ctypes.c_void_p,  # main (numpy pointer)
            ctypes.c_void_p,  # exc (numpy pointer)
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,  # per-fiber blob capacity
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
    except AttributeError:  # stale .so from before the stream assembler
        pass
    try:
        lib.lrf_dpack_encode.restype = ctypes.c_int
        lib.lrf_dpack_encode.argtypes = [
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int64),
        ]
    except AttributeError:  # stale .so from before the dpack encoder
        pass
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


_BACKENDS = {"zlib": 0, "deflate": 1}


def compress_fibers(
    matrix: np.ndarray, mode: str, level: int = 9, backend: str = "zlib"
) -> Optional[list[bytes]]:
    """DEFLATE each fiber (column/row) of a 2-D array. None if no lib.

    backend "zlib" is byte-identical to CPython `zlib.compress(fiber, level)`;
    backend "deflate" uses libdeflate — faster and equal-or-smaller output,
    still a standard zlib stream (the reference decoder reads it unchanged).
    """
    lib = _load()
    if lib is None:
        return None
    # Lay fibers out contiguously: for 'col' mode that is the transpose.
    fibers_arr = matrix.T if mode == "col" else matrix
    fibers_arr = np.ascontiguousarray(fibers_arr)
    num_fibers = fibers_arr.shape[0]
    fiber_bytes = fibers_arr.shape[1] * fibers_arr.dtype.itemsize
    if num_fibers == 0:
        return []
    # zlib compressBound-ish capacity per fiber
    cap = fiber_bytes + fiber_bytes // 1000 + 64
    out = np.empty(num_fibers * cap, dtype=np.uint8)
    out_lens = np.empty(num_fibers, dtype=np.int64)
    rc = lib.lrf_compress_fibers2(
        # pass the array's own buffer: .tobytes() duplicated every factor
        # block per call on the serializer hot path (the 2-core host is
        # the pipeline bound)
        fibers_arr.ctypes.data_as(ctypes.c_void_p),
        num_fibers,
        fiber_bytes,
        level,
        _BACKENDS[backend],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        cap,
        out_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if rc != 0:
        return None
    return [
        out[i * cap : i * cap + out_lens[i]].tobytes() for i in range(num_fibers)
    ]


def dpack_decode_segments(
    main: np.ndarray,
    exc: np.ndarray,
    seg_row_base: np.ndarray,
    seg_values: Sequence[int],
    seg_ranks: Sequence[int],
    lens: np.ndarray,
    codes: np.ndarray,
    chunk: int,
    main_words: int,
    row_words: int,
) -> Optional[np.ndarray]:
    """Decode the device delta+Huffman transport (fixed main slot +
    continuation rows) straight to int8 factor VALUES (inverse zigzag +
    running-sum undo of the delta inside the decoder). None if no lib
    (callers fall back to `lrf_tpu.ops.entropy.decode_segments_py`)."""
    lib = _load()
    if lib is None or not hasattr(lib, "lrf_dpack_decode_segments"):
        return None
    main_b = np.ascontiguousarray(main).view(np.uint8).reshape(-1)
    exc_b = np.ascontiguousarray(exc).view(np.uint8).reshape(-1)
    n_exc_rows = exc_b.size // (row_words * 4)
    seg_base64 = np.ascontiguousarray(seg_row_base, dtype=np.int64)
    seg_values64 = np.ascontiguousarray(seg_values, dtype=np.int64)
    seg_ranks64 = np.ascontiguousarray(seg_ranks, dtype=np.int64)
    lens32 = np.ascontiguousarray(lens, dtype=np.int32)
    codes32 = np.ascontiguousarray(codes, dtype=np.uint32)
    out = np.empty(int(seg_values64.sum()), np.int8)
    rc = lib.lrf_dpack_decode_segments(
        main_b.ctypes.data_as(ctypes.c_void_p),
        exc_b.ctypes.data_as(ctypes.c_void_p),
        n_exc_rows,
        seg_base64.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        seg_values64.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        seg_ranks64.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(seg_values64),
        lens32.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        codes32.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        len(lens32),
        chunk,
        main_words,
        row_words,
        int(lens32.max()),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
    )
    if rc != 0:
        return None
    return out


def decompress_fibers(
    blobs: Sequence[bytes], dtype: np.dtype, mode: str
) -> Optional[np.ndarray]:
    """Inverse of `compress_fibers`, restacking to the 2-D array. None if no lib."""
    fibers = decompress_fibers_raw(blobs, dtype)
    if fibers is None:
        return None
    return fibers.T.copy() if mode == "col" else fibers.copy()


def decompress_fibers_raw(
    blobs: Sequence[bytes], dtype: np.dtype
) -> Optional[np.ndarray]:
    """Inflate fibers to the raw FIBER-MAJOR `(num_fibers, per)` array —
    no restack/transpose (feeds `pack_values`, which reads this layout
    directly). None if the library is unavailable."""
    lib = _load()
    if lib is None or len(blobs) == 0:
        return None
    blob_lens = np.asarray([len(b) for b in blobs], dtype=np.int64)
    joined = b"".join(blobs)
    num_fibers = len(blobs)
    import zlib as _zlib

    first = np.frombuffer(_zlib.decompress(blobs[0]), dtype=dtype)
    fiber_bytes = first.nbytes
    out = np.empty(num_fibers * fiber_bytes, dtype=np.uint8)
    rc = lib.lrf_decompress_fibers(
        joined,
        blob_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        num_fibers,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        fiber_bytes,
    )
    if rc != 0:
        return None
    return out.view(dtype).reshape(num_fibers, -1)


def pack_values(
    factor_bufs: Sequence[np.ndarray],
    b: int,
    ms: Sequence[int],
    rs: Sequence[int],
    lo: int,
    bits: int,
) -> Optional[np.ndarray]:
    """Fused bit-pack of int8 fiber-major factor buffers into the decode
    upload's `(B, words_per_image)` uint32 layout (see fibercodec.cpp).

    Returns None if the library lacks the entry point OR any value falls
    outside `[lo, lo + 2^bits)` — callers fall back to the numpy path /
    unpacked upload in both cases.
    """
    lib = _load()
    if lib is None or not hasattr(lib, "lrf_pack_values"):
        return None
    n_values = sum(int(m) * int(r) for m, r in zip(ms, rs))
    vals_per_word = 30 // bits
    words = -(-n_values // vals_per_word)
    out = np.empty((b, words), dtype=np.uint32)
    bufs = [np.ascontiguousarray(f, dtype=np.int8) for f in factor_bufs]
    ptrs = (ctypes.c_void_p * len(bufs))(
        *[f.ctypes.data_as(ctypes.c_void_p).value for f in bufs]
    )
    ms_arr = np.asarray(ms, dtype=np.int64)
    rs_arr = np.asarray(rs, dtype=np.int64)
    rc = lib.lrf_pack_values(
        ptrs,
        len(bufs),
        b,
        ms_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        rs_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        lo,
        bits,
        words,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
    )
    if rc != 0:
        return None
    return out


def dpack_encode(
    factor_bufs: Sequence[np.ndarray],
    b: int,
    ms: Sequence[int],
    rs: Sequence[int],
    lens: np.ndarray,
    codes: np.ndarray,
    chunk: int,
    main_words: int,
    row_words: int,
    max_rows_budget: int,
):
    """Delta+Huffman encode fiber-major int8 factor buffers into the device
    entropy-transport layout (fibercodec.cpp::lrf_dpack_encode). Returns
    `(main, exc, chunk_rows, n_rows)` or None (no lib / budget overflow —
    callers fall back to the flat bit-pack)."""
    lib = _load()
    if lib is None or not hasattr(lib, "lrf_dpack_encode"):
        return None
    c_total = sum(
        b * (-(-int(m) * int(r) // chunk)) for m, r in zip(ms, rs)
    )
    main = np.zeros(c_total * main_words, dtype=np.uint32)
    exc = np.zeros(max_rows_budget * row_words, dtype=np.uint32)
    chunk_rows = np.zeros(c_total, dtype=np.uint8)
    n_rows = np.zeros(1, dtype=np.int64)
    bufs = [np.ascontiguousarray(f, dtype=np.int8) for f in factor_bufs]
    ptrs = (ctypes.c_void_p * len(bufs))(
        *[f.ctypes.data_as(ctypes.c_void_p).value for f in bufs]
    )
    ms_arr = np.asarray(ms, dtype=np.int64)
    rs_arr = np.asarray(rs, dtype=np.int64)
    lens32 = np.ascontiguousarray(lens, dtype=np.int32)
    codes32 = np.ascontiguousarray(codes, dtype=np.uint32)
    rc = lib.lrf_dpack_encode(
        ptrs,
        len(bufs),
        b,
        ms_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        rs_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        lens32.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        codes32.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        len(lens32),
        chunk,
        main_words,
        row_words,
        max_rows_budget,
        main.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        exc.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        chunk_rows.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n_rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if rc != 0:
        return None
    return main, exc, chunk_rows, int(n_rows[0])


_ASSEMBLE_BACKENDS = {"zlib": 0, "deflate": 1, "best": 2}


def _fiber_cap(max_m: int) -> int:
    """Per-fiber compressed-blob capacity, passed INTO the native
    assemblers (the single definition — the C side allocates and bounds
    with exactly this value, so the Python out_cap bound below can never
    silently diverge from it)."""
    return int(max_m) + int(max_m) // 8 + 128


def _stream_capacity(
    b: int, ms, rs, metadata_len: int, inner_md_lens, cap: int
) -> int:
    """Upper bound on the total bytes of b assembled streams (worst-case
    incompressible fibers at `cap` bytes per fiber blob)."""
    n_factors = len(ms)
    per_image = 4 + metadata_len + 4 * (n_factors - 1)
    for m, r, mdl in zip(ms, rs, inner_md_lens):
        per_image += 4 + mdl + 4 * (int(r) - 1) + int(r) * cap
    return b * per_image


def _slice_streams(out: np.ndarray, stream_lens: np.ndarray) -> list[bytes]:
    streams = []
    off = 0
    for n in stream_lens:
        streams.append(out[off : off + int(n)].tobytes())
        off += int(n)
    return streams


def assemble_streams(
    factor_bufs: Sequence[np.ndarray],
    b: int,
    ms: Sequence[int],
    rs: Sequence[int],
    metadata: bytes,
    inner_mds: Sequence[bytes],
    level: int,
    backend: str,
) -> Optional[list[bytes]]:
    """Finished per-image container streams from `(B, M_k, R_k)` int8
    factor blocks in ONE native call (gather + deflate + framing; see
    fibercodec.cpp::lrf_assemble_streams). Bytes identical to the
    `encode_tensor_batch` + `combine_bytes` Python assembly. None if the
    library (or entry point) is unavailable."""
    lib = _load()
    if lib is None or not hasattr(lib, "lrf_assemble_streams"):
        return None
    bufs = [np.ascontiguousarray(f, dtype=np.int8) for f in factor_bufs]
    ptrs = (ctypes.c_void_p * len(bufs))(
        *[f.ctypes.data_as(ctypes.c_void_p).value for f in bufs]
    )
    ms_arr = np.asarray(ms, dtype=np.int64)
    rs_arr = np.asarray(rs, dtype=np.int64)
    md_lens = np.asarray([len(m) for m in inner_mds], dtype=np.int64)
    md_concat = b"".join(inner_mds)
    cap = _fiber_cap(max(ms))
    out_cap = _stream_capacity(b, ms, rs, len(metadata), md_lens, cap)
    out = np.empty(out_cap, dtype=np.uint8)
    stream_lens = np.empty(b, dtype=np.int64)
    rc = lib.lrf_assemble_streams(
        ptrs,
        len(bufs),
        b,
        ms_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        rs_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        cap,
        metadata,
        len(metadata),
        md_concat,
        md_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        level,
        _ASSEMBLE_BACKENDS[backend],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out_cap,
        stream_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if rc != 0:
        return None
    return _slice_streams(out, stream_lens)


def dpack_assemble_streams(
    main: np.ndarray,
    exc: np.ndarray,
    seg_row_base: np.ndarray,
    b: int,
    ms: Sequence[int],
    rs: Sequence[int],
    lens: np.ndarray,
    codes: np.ndarray,
    chunk: int,
    main_words: int,
    row_words: int,
    metadata: bytes,
    inner_mds: Sequence[bytes],
    level: int,
    backend: str,
) -> Optional[list[bytes]]:
    """The fully fused serializer: device entropy-transport buffers ->
    finished per-image container streams (Huffman decode + fiber deflate +
    framing, each segment cache-resident; see
    fibercodec.cpp::lrf_dpack_assemble_streams). None if unavailable."""
    lib = _load()
    if lib is None or not hasattr(lib, "lrf_dpack_assemble_streams"):
        return None
    main_b = np.ascontiguousarray(main).view(np.uint8).reshape(-1)
    exc_b = np.ascontiguousarray(exc).view(np.uint8).reshape(-1)
    n_exc_rows = exc_b.size // (row_words * 4)
    seg_base64 = np.ascontiguousarray(seg_row_base, dtype=np.int64)
    ms_arr = np.asarray(ms, dtype=np.int64)
    rs_arr = np.asarray(rs, dtype=np.int64)
    lens32 = np.ascontiguousarray(lens, dtype=np.int32)
    codes32 = np.ascontiguousarray(codes, dtype=np.uint32)
    md_lens = np.asarray([len(m) for m in inner_mds], dtype=np.int64)
    md_concat = b"".join(inner_mds)
    cap = _fiber_cap(max(ms))
    out_cap = _stream_capacity(b, ms, rs, len(metadata), md_lens, cap)
    out = np.empty(out_cap, dtype=np.uint8)
    stream_lens = np.empty(b, dtype=np.int64)
    rc = lib.lrf_dpack_assemble_streams(
        main_b.ctypes.data_as(ctypes.c_void_p),
        exc_b.ctypes.data_as(ctypes.c_void_p),
        n_exc_rows,
        seg_base64.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(ms_arr),
        b,
        ms_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        rs_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        cap,
        lens32.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        codes32.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        len(lens32),
        chunk,
        main_words,
        row_words,
        int(lens32.max()),
        metadata,
        len(metadata),
        md_concat,
        md_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        level,
        _ASSEMBLE_BACKENDS[backend],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out_cap,
        stream_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if rc != 0:
        return None
    return _slice_streams(out, stream_lens)
