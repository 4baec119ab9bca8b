"""On-device entropy coding of QMF factors (static Huffman bit-pack).

The tunnel/PCIe D2H transfer of encoded factors is the batched-encode
pipeline's bottleneck: a flat 5-bit pack moves 0.625 B/value while the
factor symbol entropy is ~3.1 bits/value. This module packs factors to
~3.6 bits/value ON DEVICE in a formulation built for the TPU's vector unit
— no large scatters or gathers, no data-dependent control flow:

- static canonical Huffman table over the 32-symbol alphabet of the
  canonical bounds (-16, 15) (code lengths capped at 12 bits, LSB-first);
- values are grouped into fixed chunks of CHUNK=64; each chunk's codes are
  concatenated into a 24-word register file by CHUNK lockstep predicated
  one-hot updates (pure VPU work, ~3 ms for 1.12M values);
- the stream layout is **fixed-slot + exception tails**, chosen because a
  globally bit-compacted stream needs a searchsorted+gather compaction that
  costs ~15 ms on TPU (measured), dwarfing the coding itself:
    * main stream: the first MAIN_WORDS=7 words (224 bits) of every chunk
      at a fixed stride — a static slice, no compaction at all;
    * chunks whose codes exceed 224 bits continue in an exception row of
      TAIL_WORDS=17 words (any chunk fits: 64 values x 12 bits = 24 words).
      Exception rows are compacted in chunk order — a searchsorted+gather
      over only the (typically ~5%) overflowing chunks, sub-millisecond;
    * a tiny per-segment int32 array of exception-rank bases lets the host
      decode segments (one per factor x image) in parallel, each counting
      its own overflows — chunks are self-delimiting, so no per-chunk
      length table exists anywhere.
- typical transfer: ~0.45 B/value main + ~0.05 B/value exceptions vs
  0.625 B/value flat — and the decode host tail no longer needs the
  bit-unpack pass (the Huffman decode emits int8 factors directly).

Host-side decode lives in the native fiber codec (`native/fibercodec.cpp`,
thread-pooled, 4096-entry LUT) with a pure-numpy fallback
(`decode_segments_py`) for environments without the .so.

This implements the "entropy/bit-pack coding on device" north-star target:
the byte-exact zlib container is unchanged (the host still deflates
fibers); device entropy coding shrinks only the device->host transport.
"""

from __future__ import annotations

import numpy as np

CHUNK = 64  # values per chunk
MAX_LEN = 12  # Huffman code length cap (LUT = 4096 entries)
MAIN_WORDS = 7  # fixed per-chunk slot in the main stream (224 bits)
REG_WORDS = CHUNK * MAX_LEN // 32  # 24: worst-case whole chunk
TAIL_WORDS = REG_WORDS - MAIN_WORDS  # 17: exception row

# Factor-value histogram for the canonical (-16, 15) config, blended over
# demo-image sweeps at several qualities, with a frequency floor so every
# symbol keeps a code (static table: unseen symbols still encode, just
# longer). The exact counts only tune compression, never correctness.
_HIST = np.array(
    [
        2,     2,     3,     5,     8,    14,    25,    48,
        69,   106,   251,   412,   735,  1513,  5123, 18460,
        18460, 8069,  1546,  658,   942,   464,   701,  1146,
        2141,  2762,  1081,  362,   113,    53,    23,   192,
    ],
    dtype=np.float64,
)
# (index i = value i - 16 for lo = -16; symmetrized low tail + floor)


def canonical_huffman(freqs: np.ndarray, max_len: int = MAX_LEN):
    """Static canonical Huffman code: (lens, codes_lsb_first).

    Plain Huffman tree; if any code exceeds `max_len`, the frequency floor
    is raised and the tree rebuilt (flattens the deepest leaves — within a
    fraction of a percent of the length-capped optimum on this alphabet).
    Codes are canonical (shortest-first, symbol-order ties) and returned
    bit-reversed so the encoder/decoder read LSB-first.
    """
    import heapq

    n = len(freqs)
    f = freqs.astype(np.float64) + 1e-9
    while True:
        heap = [(w, i) for i, w in enumerate(f)]
        heapq.heapify(heap)
        children = {}
        nxt = n
        while len(heap) > 1:
            aw, ai = heapq.heappop(heap)
            bw, bi = heapq.heappop(heap)
            children[nxt] = (ai, bi)
            heapq.heappush(heap, (aw + bw, nxt))
            nxt += 1
        lens = np.zeros(n, dtype=np.int32)
        stack = [(heap[0][1], 0)]
        while stack:
            nid, d = stack.pop()
            if nid < n:
                lens[nid] = max(d, 1)
            else:
                l, r = children[nid]
                stack += [(l, d + 1), (r, d + 1)]
        if lens.max() <= max_len:
            break
        f = np.maximum(f, f.max() / (1 << (max_len - 2)))
    order = np.lexsort((np.arange(n), lens))
    codes = np.zeros(n, dtype=np.uint32)
    code = 0
    prev = 0
    for s in order:
        L = int(lens[s])
        code <<= L - prev
        codes[s] = code
        code += 1
        prev = L
    rev = np.zeros(n, dtype=np.uint32)
    for s in range(n):
        c, L = int(codes[s]), int(lens[s])
        r = 0
        for _ in range(L):
            r = (r << 1) | (c & 1)
            c >>= 1
        rev[s] = r
    return lens.astype(np.int32), rev


LENS, CODES = canonical_huffman(_HIST)

PAD_SYMBOL = int(np.argmin(LENS))  # cheapest symbol pads segment tails


def segment_layout(shapes):
    """Per-(factor, image) segment sizes for a list of (B, M, R) shapes.

    Returns (values_per_segment, chunks_per_segment, segment_chunk_bounds)
    where bounds has n_segments + 1 entries of cumulative chunk indices.
    """
    values, chunks = [], []
    for shape in shapes:
        b = shape[0]
        per = int(np.prod(shape[1:]))
        values += [per] * b
        chunks += [-(-per // CHUNK)] * b
    bounds = [0]
    for c in chunks:
        bounds.append(bounds[-1] + c)
    return values, chunks, bounds


def default_exc_rows(c_total: int) -> int:
    """Exception-buffer row budget: ~12.5% of chunks (typical overflow is
    ~5% on factor data; TPU row-gathers cost ~60 ns/element, so sizing the
    compaction to the worst case would cost more device time than the
    transfer it saves — callers fall back to flat packing on the rare
    batch that exceeds the budget)."""
    return min(c_total, c_total // 8 + 64)


def pack_segments(factors, lo: int, max_exc_rows=None):
    """Device-side Huffman pack of a list of (B, M, R) integer factors.

    Returns `(seg_ovf_base, main, exc)`:
      - `seg_ovf_base`: int32 (n_segments + 1) — exception-row rank at each
        segment boundary; the last entry is the total exception-row count.
        If it exceeds `max_exc_rows` (default `default_exc_rows`), `exc` is
        truncated and the pack is unusable — the caller must fall back
        (e.g. to the flat 5-bit pack);
      - `main`: uint32 (C * MAIN_WORDS) — 7-word slot per chunk;
      - `exc`: uint32 (max_exc_rows * TAIL_WORDS); only rows
        [0, seg_ovf_base[-1]) carry data.
    """
    import jax.numpy as jnp
    from jax import lax

    lens_t = jnp.asarray(LENS, jnp.int32)
    codes_t = jnp.asarray(CODES, jnp.uint32)

    # ---- chunk matrix (C, CHUNK) of symbols, segment-padded
    chunk_rows = []
    for f in factors:
        b = f.shape[0]
        flat = f.reshape(b, -1).astype(jnp.int32) - lo
        per = flat.shape[1]
        padded = -(-per // CHUNK) * CHUNK
        flat = jnp.pad(
            flat, ((0, 0), (0, padded - per)), constant_values=PAD_SYMBOL
        )
        chunk_rows.append(flat.reshape(b * (padded // CHUNK), CHUNK))
    sym = jnp.concatenate(chunk_rows, axis=0)  # (C, CHUNK)
    c_total = sym.shape[0]

    lens = lens_t[sym]  # (C, CHUNK)
    codes = codes_t[sym]
    ends = jnp.cumsum(lens, axis=1)
    starts = (ends - lens).astype(jnp.uint32)
    total_bits = ends[:, -1].astype(jnp.int32)  # (C,)

    # ---- register-file concat: CHUNK lockstep predicated updates
    word_iota = jnp.arange(REG_WORDS, dtype=jnp.uint32)[None, :]

    def step(t, regs):
        code = lax.dynamic_slice_in_dim(codes, t, 1, axis=1)[:, 0]
        start = lax.dynamic_slice_in_dim(starts, t, 1, axis=1)[:, 0]
        sh = start & jnp.uint32(31)
        w = (start >> 5).astype(jnp.uint32)
        low = (code << sh).astype(jnp.uint32)
        # straddle bits into the next word; sh == 0 would shift by 32
        high = jnp.where(
            sh == 0, jnp.uint32(0), code >> (jnp.uint32(32) - sh)
        ).astype(jnp.uint32)
        hit_lo = (word_iota == w[:, None]).astype(jnp.uint32)
        hit_hi = (word_iota == (w + 1)[:, None]).astype(jnp.uint32)
        # codes occupy disjoint bit ranges, so add == bitwise-or
        return regs + low[:, None] * hit_lo + high[:, None] * hit_hi

    regs = lax.fori_loop(
        0, CHUNK, step, jnp.zeros((c_total, REG_WORDS), jnp.uint32)
    )

    # ---- fixed-slot main stream: a static slice, no compaction
    main = regs[:, :MAIN_WORDS].reshape(-1)

    # ---- exception tails, compacted in chunk order into a small budget
    # (row-gathers cost ~60 ns/element on TPU, so the compaction is sized
    # to the typical overflow count, not the worst case)
    n_slots = default_exc_rows(c_total) if max_exc_rows is None else max_exc_rows
    overflow = total_bits > MAIN_WORDS * 32  # (C,)
    ovf_rank = jnp.cumsum(overflow.astype(jnp.int32))  # inclusive
    slots = jnp.arange(n_slots, dtype=jnp.int32)
    src = jnp.searchsorted(ovf_rank, slots + 1, side="left")
    src = jnp.clip(src, 0, c_total - 1)
    exc_rows = regs[src, MAIN_WORDS:]
    valid = slots < ovf_rank[-1]
    exc = jnp.where(valid[:, None], exc_rows, 0).reshape(-1)

    # ---- per-segment exception-rank bases (static boundary indices)
    shapes = [tuple(f.shape) for f in factors]
    _, _, bounds = segment_layout(shapes)
    rank0 = jnp.concatenate([jnp.zeros((1,), jnp.int32), ovf_rank])
    seg_ovf_base = rank0[jnp.asarray(bounds, jnp.int32)]
    return seg_ovf_base, main, exc


def decode_segments_py(
    main: np.ndarray,
    exc: np.ndarray,
    seg_ovf_base: np.ndarray,
    values_per_segment,
    lo: int,
) -> np.ndarray:
    """Pure-numpy/python reference decoder (test/fallback path; production
    is `native.fibercodec.huffman_decode_segments`)."""
    lut_sym = np.zeros(1 << MAX_LEN, np.int32)
    lut_len = np.zeros(1 << MAX_LEN, np.int32)
    for s in range(len(LENS)):
        L = int(LENS[s])
        c = int(CODES[s])
        for fill in range(1 << (MAX_LEN - L)):
            lut_sym[c | (fill << L)] = s
            lut_len[c | (fill << L)] = L

    main_b = np.ascontiguousarray(main).view(np.uint8)
    exc_b = np.ascontiguousarray(exc).view(np.uint8)
    main_bytes = MAIN_WORDS * 4
    tail_bytes = TAIL_WORDS * 4
    out = []
    chunk_id = 0
    for s, n_vals in enumerate(values_per_segment):
        exc_cursor = int(seg_ovf_base[s])
        vals = np.empty(-(-n_vals // CHUNK) * CHUNK, np.int32)
        vi = 0
        while vi < len(vals):
            buf = main_b[chunk_id * main_bytes : (chunk_id + 1) * main_bytes]
            buf = np.concatenate(
                [
                    buf,
                    exc_b[exc_cursor * tail_bytes : (exc_cursor + 1) * tail_bytes],
                    np.zeros(tail_bytes, np.uint8),  # lazy-tail headroom
                ]
            )
            bitpos = 0
            for _ in range(CHUNK):
                byte0 = bitpos >> 3
                window = int.from_bytes(
                    buf[byte0 : byte0 + 3].tobytes(), "little"
                ) >> (bitpos & 7)
                entry = window & ((1 << MAX_LEN) - 1)
                vals[vi] = lut_sym[entry]
                bitpos += int(lut_len[entry])
                vi += 1
            if bitpos > MAIN_WORDS * 32:
                exc_cursor += 1
            chunk_id += 1
        out.append(vals[:n_vals])
    return np.concatenate(out) + lo


def expected_bits_per_value() -> float:
    p = _HIST / _HIST.sum()
    return float(np.sum(p * LENS))
