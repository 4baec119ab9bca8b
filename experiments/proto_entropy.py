"""Prototype: device-side static-Huffman bit-pack of factor values.

Measures the device cost of the scatter-add packing formulation at bench
shapes (1.12M values) and validates a host-side numpy decode round-trip.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def canonical_huffman(freqs: np.ndarray, max_len: int = 12):
    """(lens, codes_lsb_first) canonical Huffman for the given frequencies.

    Package-merge would be optimal under the length cap; here we build a
    plain Huffman tree and, if any code exceeds max_len, flatten by raising
    the floor of the frequency distribution until it fits (static global
    table — a fraction of a percent from optimal on these alphabets).
    """
    n = len(freqs)
    f = freqs.astype(np.float64) + 1e-9
    while True:
        # build tree
        import heapq

        heap = [(w, i, None) for i, w in enumerate(f)]
        heapq.heapify(heap)
        nodes = {}
        next_id = n
        while len(heap) > 1:
            a = heapq.heappop(heap)
            b = heapq.heappop(heap)
            nodes[next_id] = (a[1], b[1])
            heapq.heappush(heap, (a[0] + b[0], next_id, None))
            next_id += 1
        lens = np.zeros(n, dtype=np.int32)

        def walk(nid, depth):
            if nid < n:
                lens[nid] = max(depth, 1)
                return
            l, r = nodes[nid]
            walk(l, depth + 1)
            walk(r, depth + 1)

        walk(heap[0][1], 0)
        if lens.max() <= max_len:
            break
        f = np.maximum(f, f.max() / (1 << (max_len - 2)))
    # canonical code assignment (shortest first, then symbol order)
    order = np.lexsort((np.arange(n), lens))
    codes = np.zeros(n, dtype=np.uint32)
    code = 0
    prev_len = 0
    for s in order:
        L = int(lens[s])
        code <<= L - prev_len
        codes[s] = code
        code += 1
        prev_len = L
    # bit-reverse each code to LSB-first within its length
    rev = np.zeros(n, dtype=np.uint32)
    for s in range(n):
        c, L = int(codes[s]), int(lens[s])
        r = 0
        for _ in range(L):
            r = (r << 1) | (c & 1)
            c >>= 1
        rev[s] = r
    return lens, rev


def pack_jnp(sym, lens_t, codes_t, n_words):
    import jax.numpy as jnp

    lens = lens_t[sym]
    codes = codes_t[sym].astype(jnp.uint64)
    ends = jnp.cumsum(lens.astype(jnp.uint32))
    offs = ends - lens.astype(jnp.uint32)
    word_idx = (offs >> 5).astype(jnp.int32)
    shift = (offs & 31).astype(jnp.uint64)
    wide = codes << shift
    low = (wide & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    high = (wide >> jnp.uint64(32)).astype(jnp.uint32)
    words = jnp.zeros(n_words, jnp.uint32)
    words = words.at[word_idx].add(low, mode="drop")
    words = words.at[word_idx + 1].add(high, mode="drop")
    return words, ends[-1]


def decode_np(words: np.ndarray, total_bits: int, lens, codes, n_values):
    """Bit-serial numpy/python reference decoder (LSB-first)."""
    # decode LUT on 12 bits
    max_len = int(lens.max())
    lut_sym = np.zeros(1 << max_len, np.int32)
    lut_len = np.zeros(1 << max_len, np.int32)
    for s in range(len(lens)):
        L = int(lens[s])
        c = int(codes[s])
        for fill in range(1 << (max_len - L)):
            idx = c | (fill << L)
            lut_sym[idx] = s
            lut_len[idx] = L
    bits = np.unpackbits(
        words.view(np.uint8), bitorder="little"
    )
    out = np.empty(n_values, np.int32)
    pos = 0
    for i in range(n_values):
        window = 0
        for b in range(max_len):
            if pos + b < len(bits):
                window |= int(bits[pos + b]) << b
        out[i] = lut_sym[window]
        pos += lut_len[window]
    assert pos == total_bits, (pos, total_bits)
    return out


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/lrf_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    # representative histogram (kodim01-fig 512x768 q=10 factors)
    hist = np.ones(32)
    measured = {
        -9: 11, -8: 48, -7: 69, -6: 106, -5: 251, -4: 412, -3: 735,
        -2: 1513, -1: 5123, 0: 18460, 1: 8069, 2: 1546, 3: 658, 4: 942,
        5: 464, 6: 701, 7: 1146, 8: 2141, 9: 2762, 10: 1081, 11: 362,
        12: 53, 13: 3, 15: 192,
    }
    for v, c in measured.items():
        hist[v + 16] += c
    lens, codes = canonical_huffman(hist)
    print("code lens:", lens.tolist())

    n = 1_124_352  # bench values per batch
    rng = np.random.default_rng(0)
    sym = rng.choice(32, n, p=hist / hist.sum()).astype(np.int32)
    exp_bits = lens[sym].sum()
    print(f"expected bits: {exp_bits} = {exp_bits/8/1024:.0f} KiB "
          f"({exp_bits/n:.2f} bits/value) vs 5-bit pack {5*n/8/1024:.0f} KiB")

    n_words = int(n * 12 // 32)
    lens_t = jnp.asarray(lens, jnp.uint32)
    codes_t = jnp.asarray(codes, jnp.uint32)

    fn = jax.jit(lambda s: pack_jnp(s, lens_t, codes_t, n_words))
    dev = jax.devices()[0]
    s_dev = jax.device_put(jnp.asarray(sym), dev)
    words, total = fn(s_dev)
    jax.block_until_ready((words, total))
    reps = 10

    @jax.jit
    def chained(s):
        def body(i, acc):
            w, t = pack_jnp(jnp.roll(s, i), lens_t, codes_t, n_words)
            return acc + t + w[0]

        return jax.lax.fori_loop(0, reps, body, jnp.uint32(0))

    chained(s_dev).block_until_ready()
    t0 = time.perf_counter()
    chained(s_dev).block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    print(f"device pack: {dt*1000:.2f} ms per 1.12M values")

    # round-trip check (on a small slice to keep the python decoder fast)
    m = 20000
    w_small, t_small = jax.jit(
        lambda s: pack_jnp(s, lens_t, codes_t, m * 12 // 32 + 2)
    )(jnp.asarray(sym[:m]))
    got = decode_np(np.asarray(w_small), int(t_small), lens, codes, m)
    assert np.array_equal(got, sym[:m]), "round-trip mismatch"
    print("round-trip OK")


if __name__ == "__main__":
    main()
