// Native fiber codec: thread-pooled per-fiber DEFLATE for factor
// serialization.
//
// The reference compresses every factor column with a separate Python-level
// zlib call (pashtari/lrf `lrf/compression/utils.py:374-378`). For batched
// TPU encoding that Python loop is the serialization bottleneck, so this
// library does the same work natively: split a row-major fiber block into
// fibers, deflate each at the requested level on a std::thread pool, and
// return per-fiber compressed lengths.
//
// Two compressor backends, both emitting standard zlib streams (decodable
// by the reference's CPython `zlib.decompress`):
//   backend 0: zlib — byte output identical to CPython's `zlib.compress`
//              (both wrap the same zlib deflate with default settings).
//   backend 1: libdeflate — ~4-5x faster than zlib level 9 at equal-or-
//              smaller output on factor fibers (measured: level 6 gives
//              98.4% of zlib-9's size at 4.7x its speed).
// Decompression always uses libdeflate (output bytes are inflater-agnostic,
// libdeflate's inflate is ~2x zlib's).
//
// Build: make -C lrf_tpu/native   (produces libfibercodec.so)

#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <functional>
#include <mutex>
#include <thread>
#include <vector>

#include <libdeflate.h>
#include <zlib.h>

namespace {

// Per-thread cached deflate/inflate states. `compress2`/`uncompress`
// allocate and free ~256 KiB of internal zlib state per call, which
// dominates when fibers are a few KiB; `deflateReset`/`inflateReset`
// restore a cached stream to its freshly-initialized state, so the output
// bytes are identical to one-shot `compress2` (same windowBits/memLevel/
// strategy defaults) at a fraction of the cost.
int compress_one(const uint8_t* src, int64_t src_len, uint8_t* dst,
                 int64_t dst_cap, int level, int64_t* out_len) {
  struct TlsDeflate {
    z_stream strm;
    int level = -1;
    bool live = false;
  };
  thread_local TlsDeflate tls;  // workers are detached process-lifetime
  if (!tls.live || tls.level != level) {
    if (tls.live) {
      deflateEnd(&tls.strm);
      tls.live = false;
    }
    std::memset(&tls.strm, 0, sizeof(tls.strm));
    if (deflateInit(&tls.strm, level) != Z_OK) return Z_MEM_ERROR;
    tls.live = true;
    tls.level = level;
  } else if (deflateReset(&tls.strm) != Z_OK) {
    return Z_STREAM_ERROR;
  }
  tls.strm.next_in = const_cast<Bytef*>(src);
  tls.strm.avail_in = static_cast<uInt>(src_len);
  tls.strm.next_out = dst;
  tls.strm.avail_out = static_cast<uInt>(dst_cap);
  int rc = deflate(&tls.strm, Z_FINISH);
  if (rc != Z_STREAM_END) return rc == Z_OK ? Z_BUF_ERROR : rc;
  *out_len = dst_cap - static_cast<int64_t>(tls.strm.avail_out);
  return Z_OK;
}

// libdeflate compressor, cached per (thread, level). Emits a zlib-wrapped
// DEFLATE stream: standard format, decodable by any zlib inflater.
int compress_one_libdeflate(const uint8_t* src, int64_t src_len, uint8_t* dst,
                            int64_t dst_cap, int level, int64_t* out_len) {
  struct TlsComp {
    libdeflate_compressor* c = nullptr;
    int level = -1;
  };
  thread_local TlsComp tls;
  if (tls.c == nullptr || tls.level != level) {
    if (tls.c != nullptr) libdeflate_free_compressor(tls.c);
    tls.c = libdeflate_alloc_compressor(level);
    if (tls.c == nullptr) return Z_MEM_ERROR;
    tls.level = level;
  }
  size_t n = libdeflate_zlib_compress(tls.c, src, static_cast<size_t>(src_len),
                                      dst, static_cast<size_t>(dst_cap));
  if (n == 0) return Z_BUF_ERROR;
  *out_len = static_cast<int64_t>(n);
  return Z_OK;
}

// Inflate via libdeflate (we always know the exact output size, which is
// what libdeflate's one-shot API wants; passing a null actual-out pointer
// additionally *checks* the stream inflates to exactly dst_cap bytes).
int decompress_one(const uint8_t* src, int64_t src_len, uint8_t* dst,
                   int64_t dst_cap) {
  struct TlsDecomp {
    libdeflate_decompressor* d = nullptr;
  };
  thread_local TlsDecomp tls;
  if (tls.d == nullptr) {
    tls.d = libdeflate_alloc_decompressor();
    if (tls.d == nullptr) return Z_MEM_ERROR;
  }
  libdeflate_result rc = libdeflate_zlib_decompress(
      tls.d, src, static_cast<size_t>(src_len), dst,
      static_cast<size_t>(dst_cap), nullptr);
  return rc == LIBDEFLATE_SUCCESS ? Z_OK : Z_DATA_ERROR;
}

// Persistent thread pool: zlib calls are ~100us-1ms each, so per-call
// thread spawn would dominate. Workers live for the process lifetime.
class Pool {
 public:
  static Pool& instance() {
    // Intentionally leaked: a static instance would run its destructor at
    // process exit and tear down the mutex/cv under the detached workers.
    static Pool* pool = new Pool();
    return *pool;
  }

  template <typename Fn>
  void run(int64_t n, Fn&& fn) {
    if (n <= 0) return;
    if (n == 1 || workers_.empty()) {
      for (int64_t i = 0; i < n; ++i) fn(i);
      return;
    }
    // One parallel_for at a time: task_/next_/remaining_ are single shared
    // slots, so a second concurrent caller (e.g. two GIL-released
    // serializer threads) would overwrite the task the workers are still
    // draining. Callers queue here; each still fans out over all cores.
    std::lock_guard<std::mutex> submission(submit_mu_);
    std::unique_lock<std::mutex> lock(mu_);
    task_ = fn;
    total_ = n;
    next_ = 0;
    remaining_ = n;
    ++generation_;
    cv_.notify_all();
    done_cv_.wait(lock, [this] { return remaining_ == 0; });
    task_ = nullptr;
  }

 private:
  Pool() {
    unsigned hw = std::thread::hardware_concurrency();
    size_t num = hw ? hw : 4;
    for (size_t t = 0; t < num; ++t) {
      // Detached: workers live for the process lifetime and must not block
      // process exit (they hold no resources beyond the static pool state).
      std::thread th([this] { worker_loop(); });
      workers_.push_back(th.get_id());
      th.detach();
    }
  }

  void worker_loop() {
    uint64_t seen = 0;
    for (;;) {
      std::unique_lock<std::mutex> lock(mu_);
      cv_.wait(lock, [&] { return generation_ != seen; });
      seen = generation_;
      for (;;) {
        int64_t i = next_;
        if (i >= total_) break;
        next_ = i + 1;
        lock.unlock();
        task_(i);
        lock.lock();
        if (--remaining_ == 0) done_cv_.notify_all();
      }
    }
  }

  std::vector<std::thread::id> workers_;
  std::mutex submit_mu_;  // serializes whole run() calls (see above)
  std::mutex mu_;
  std::condition_variable cv_;
  std::condition_variable done_cv_;
  std::function<void(int64_t)> task_;
  int64_t total_ = 0;
  int64_t next_ = 0;
  int64_t remaining_ = 0;
  uint64_t generation_ = 0;
};

template <typename Fn>
void parallel_for(int64_t n, Fn fn) {
  Pool::instance().run(n, fn);
}

}  // namespace

extern "C" {

// Compress `num_fibers` contiguous fibers of `fiber_bytes` bytes each from
// `data`. Each fiber's deflate output goes to `out + i * out_cap`; its
// length to `out_lens[i]`. `backend`: 0 = zlib (CPython-byte-identical),
// 1 = libdeflate (faster, equal-or-smaller, still a zlib stream).
// Returns 0 on success.
int lrf_compress_fibers2(const uint8_t* data, int64_t num_fibers,
                         int64_t fiber_bytes, int level, int backend,
                         uint8_t* out, int64_t out_cap, int64_t* out_lens) {
  std::vector<int> rcs(static_cast<size_t>(num_fibers), Z_OK);
  parallel_for(num_fibers, [&](int64_t i) {
    rcs[static_cast<size_t>(i)] =
        backend == 1
            ? compress_one_libdeflate(data + i * fiber_bytes, fiber_bytes,
                                      out + i * out_cap, out_cap, level,
                                      &out_lens[i])
            : compress_one(data + i * fiber_bytes, fiber_bytes,
                           out + i * out_cap, out_cap, level, &out_lens[i]);
  });
  for (int rc : rcs)
    if (rc != Z_OK) return rc;
  return 0;
}

int lrf_compress_fibers(const uint8_t* data, int64_t num_fibers,
                        int64_t fiber_bytes, int level, uint8_t* out,
                        int64_t out_cap, int64_t* out_lens) {
  return lrf_compress_fibers2(data, num_fibers, fiber_bytes, level,
                              /*backend=*/0, out, out_cap, out_lens);
}

// Decode the device-side entropy coder's fixed-slot + exception-tail
// format (lrf_tpu/ops/entropy.py): canonical LSB-first Huffman codes
// (lengths `lens[alphabet]` / codes `codes[alphabet]`, max length 12);
// `chunk` values per chunk; every chunk owns `main_words` uint32 in `main`
// at a fixed stride, and chunks whose codes exceed main_words*32 bits
// continue in a `tail_words`-word row of `exc`, rows assigned in chunk
// order (chunks are self-delimiting — the decoder discovers overflow from
// its own bit count). Segment s (one per factor x image) holds
// `seg_values[s]` values (chunk padding decoded and dropped) and its first
// exception row is `seg_ovf_base[s]`. Output: int8 values (symbol + lo),
// segments concatenated.
// Decode the delta+zigzag Huffman transport (lrf_tpu/ops/entropy.py
// `pack_segments`): fixed `main_words`-word slot per chunk of 64 symbols +
// `row_words`-word continuation rows allocated densely in chunk order, with
// per-segment row bases. Emits factor VALUES: inverse zigzag then running
// sum along the segment's rank stride (the encoder differenced each
// (M, R) factor along M with rank-interleaved flattening).
int lrf_dpack_decode_segments(const uint8_t* main, const uint8_t* exc,
                              int64_t n_exc_rows, const int64_t* seg_row_base,
                              const int64_t* seg_values,
                              const int64_t* seg_ranks, int64_t num_segments,
                              const int32_t* lens, const uint32_t* codes,
                              int64_t alphabet, int64_t chunk,
                              int64_t main_words, int64_t row_words,
                              int64_t max_len, int8_t* out) {
  if (max_len <= 0 || max_len > 16) return 1;
  struct Entry {
    int8_t sym;
    int8_t len;
  };
  // LUT: index = next `max_len` bits (LSB-first) -> (symbol, length)
  std::vector<Entry> lut(static_cast<size_t>(1) << max_len);
  for (int64_t s = 0; s < alphabet; ++s) {
    int L = lens[s];
    if (L <= 0 || L > max_len) return 1;
    uint32_t c = codes[s];
    for (uint32_t fill = 0; fill < (1u << (max_len - L)); ++fill) {
      uint32_t idx = c | (fill << L);
      lut[idx] = {static_cast<int8_t>(s), static_cast<int8_t>(L)};
    }
  }
  const int64_t main_bytes = main_words * 4;
  const int64_t row_bytes = row_words * 4;
  const int64_t main_bits = main_words * 32;
  const int64_t row_bits = row_words * 32;
  const int64_t max_rows =
      (chunk * max_len - main_bits + row_bits - 1) / row_bits;
  const uint32_t lut_mask = (1u << max_len) - 1;
  // per-segment output offsets and first-chunk ids
  std::vector<int64_t> out_off(static_cast<size_t>(num_segments));
  std::vector<int64_t> chunk0(static_cast<size_t>(num_segments));
  int64_t acc = 0, chk = 0;
  for (int64_t s = 0; s < num_segments; ++s) {
    out_off[static_cast<size_t>(s)] = acc;
    chunk0[static_cast<size_t>(s)] = chk;
    acc += seg_values[s];
    chk += (seg_values[s] + chunk - 1) / chunk;
  }
  std::vector<int> rcs(static_cast<size_t>(num_segments), 0);
  parallel_for(num_segments, [&](int64_t s) {
    const int64_t r_stride = seg_ranks[s];
    if (r_stride <= 0) {
      rcs[static_cast<size_t>(s)] = 2;
      return;
    }
    int8_t* dst = out + out_off[static_cast<size_t>(s)];
    int64_t remaining = seg_values[s];
    int64_t cid = chunk0[static_cast<size_t>(s)];
    int64_t row_cursor = seg_row_base[s];
    int64_t v = 0;  // value index within the segment (for the rank stride)
    std::vector<int32_t> run(static_cast<size_t>(r_stride), 0);
    // scratch: main slot + worst-case continuation rows + lookahead slack.
    // +1 row: when every code in a chunk is max_len the peek before the
    // final symbol can demand ((chunk*max_len + 7) >> 3) + 1 bytes, which
    // rounds up to one row beyond max_rows (the row itself is zero-padding
    // the decoder never consumes past the last code's end bit).
    std::vector<uint8_t> buf(
        static_cast<size_t>(main_bytes + (max_rows + 1) * row_bytes + 4), 0);
    while (remaining > 0) {
      std::memcpy(buf.data(), main + cid * main_bytes,
                  static_cast<size_t>(main_bytes));
      int64_t filled = main_bytes;  // bytes of buf holding real stream data
      int64_t peek = row_cursor;
      int64_t take = remaining < chunk ? remaining : chunk;
      int64_t bitpos = 0;
      for (int64_t i = 0; i < chunk; ++i) {
        // decode may peek past the last code's end; rows consumed are
        // counted from the final bit position (mirroring the encoder), so
        // over-peeked rows stay available to the next chunk
        while (((bitpos + max_len + 7) >> 3) + 1 > filled) {
          if (peek < n_exc_rows) {
            std::memcpy(buf.data() + filled, exc + peek * row_bytes,
                        static_cast<size_t>(row_bytes));
          } else {
            std::memset(buf.data() + filled, 0,
                        static_cast<size_t>(row_bytes));
          }
          filled += row_bytes;
          ++peek;
        }
        int64_t byte0 = bitpos >> 3;
        uint32_t window = static_cast<uint32_t>(buf[byte0]) |
                          (static_cast<uint32_t>(buf[byte0 + 1]) << 8) |
                          (static_cast<uint32_t>(buf[byte0 + 2]) << 16);
        Entry e = lut[(window >> (bitpos & 7)) & lut_mask];
        if (i < take) {
          int32_t zz = e.sym;
          int32_t d = (zz & 1) ? -((zz + 1) >> 1) : (zz >> 1);
          int32_t& a = run[static_cast<size_t>(v % r_stride)];
          a += d;
          dst[i] = static_cast<int8_t>(a);
          ++v;
        }
        bitpos += e.len;
      }
      if (bitpos > main_bits)
        row_cursor += (bitpos - main_bits + row_bits - 1) / row_bits;
      dst += take;
      remaining -= take;
      ++cid;
    }
  });
  for (int rc : rcs)
    if (rc != 0) return rc;
  return 0;
}

// Decompress `num_fibers` concatenated deflate blobs (lengths in
// `blob_lens`) into `out`, each fiber occupying `fiber_bytes` bytes.
int lrf_decompress_fibers(const uint8_t* blobs, const int64_t* blob_lens,
                          int64_t num_fibers, uint8_t* out,
                          int64_t fiber_bytes) {
  std::vector<int64_t> offsets(static_cast<size_t>(num_fibers));
  int64_t off = 0;
  for (int64_t i = 0; i < num_fibers; ++i) {
    offsets[static_cast<size_t>(i)] = off;
    off += blob_lens[i];
  }
  std::vector<int> rcs(static_cast<size_t>(num_fibers), Z_OK);
  parallel_for(num_fibers, [&](int64_t i) {
    rcs[static_cast<size_t>(i)] =
        decompress_one(blobs + offsets[static_cast<size_t>(i)], blob_lens[i],
                       out + i * fiber_bytes, fiber_bytes);
  });
  for (int rc : rcs)
    if (rc != Z_OK) return rc;
  return 0;
}

// Delta + zigzag static-Huffman encode of int8 factor values into the
// device entropy-transport layout (the H2D mirror of the encode-side
// `lrf_tpu.ops.entropy.pack_segments`): per 64-value chunk, a fixed
// MAIN_WORDS slot in `main_out` plus ROW_WORDS-word continuation rows
// allocated densely in global chunk order in `exc_out`; per-chunk row
// counts in `chunk_rows_out` (the device decoder cumsums them into row
// bases). Segments are (factor, image) in factor-major order, each padded
// to a chunk multiple with the zz=0 pad symbol; the delta runs along M
// within each rank column (stream order is m-major, so the running value
// is tracked per column). Returns 1 if the total rows exceed
// `max_rows_budget` (caller falls back to the flat bit-pack).
int lrf_dpack_encode(const int8_t* const* factor_bufs, int64_t n_factors,
                     int64_t b, const int64_t* ms, const int64_t* rs,
                     const int32_t* lens, const uint32_t* codes,
                     int64_t alphabet, int64_t chunk, int64_t main_words,
                     int64_t row_words, int64_t max_rows_budget,
                     uint32_t* main_out, uint32_t* exc_out,
                     uint8_t* chunk_rows_out, int64_t* n_rows_out) {
  const int64_t main_bits = main_words * 32;
  const int64_t row_bits = row_words * 32;
  int64_t max_len = 0;
  for (int64_t s = 0; s < alphabet; ++s)
    if (lens[s] > max_len) max_len = lens[s];
  // chunk_rows_out is uint8: the worst-case rows/chunk must fit
  if ((chunk * max_len - main_bits + row_bits - 1) / row_bits > 255) return 3;
  std::vector<int> seg_bad;
  // segment table: (factor, image) -> first chunk id
  std::vector<int64_t> seg_factor, seg_image, seg_chunk0;
  int64_t c_total = 0;
  for (int64_t k = 0; k < n_factors; ++k) {
    const int64_t per = ms[k] * rs[k];
    const int64_t chunks = (per + chunk - 1) / chunk;
    for (int64_t bi = 0; bi < b; ++bi) {
      seg_factor.push_back(k);
      seg_image.push_back(bi);
      seg_chunk0.push_back(c_total);
      c_total += chunks;
    }
  }
  const int64_t n_segments = static_cast<int64_t>(seg_factor.size());
  seg_bad.assign(static_cast<size_t>(n_segments), 0);

  // pass 1: per-chunk bit counts -> row counts (parallel over segments)
  parallel_for(n_segments, [&](int64_t si) {
    const int64_t k = seg_factor[static_cast<size_t>(si)];
    const int64_t bi = seg_image[static_cast<size_t>(si)];
    const int64_t m = ms[k], r = rs[k], per = m * r;
    const int8_t* buf = factor_bufs[k] + bi * r * m;
    std::vector<int32_t> run(static_cast<size_t>(r), 0);
    int64_t cid = seg_chunk0[static_cast<size_t>(si)];
    int64_t bits = 0, in_chunk = 0;
    // m-major walk without per-value div/mod (measured: the v/r, v%r
    // form cost ~30 ms/batch64 on this host)
    int64_t mi = 0, ri = 0;
    const int64_t padded = ((per + chunk - 1) / chunk) * chunk;
    for (int64_t v = 0; v < padded; ++v) {
      int32_t zz = 0;
      if (v < per) {
        const int32_t x = buf[ri * m + mi];
        const int32_t d = x - run[static_cast<size_t>(ri)];
        run[static_cast<size_t>(ri)] = x;
        zz = d >= 0 ? 2 * d : -2 * d - 1;
        if (zz >= alphabet) {  // delta outside the static code's alphabet
          seg_bad[static_cast<size_t>(si)] = 1;
          zz = 0;
        }
        if (++ri == r) {
          ri = 0;
          ++mi;
        }
      }
      bits += lens[zz];
      if (++in_chunk == chunk) {
        const int64_t rows =
            bits > main_bits ? (bits - main_bits + row_bits - 1) / row_bits : 0;
        chunk_rows_out[cid++] = static_cast<uint8_t>(rows);
        bits = 0;
        in_chunk = 0;
      }
    }
  });
  // global row bases (exclusive cumsum over all chunks, chunk order)
  std::vector<int64_t> base(static_cast<size_t>(c_total) + 1, 0);
  for (int64_t c = 0; c < c_total; ++c)
    base[static_cast<size_t>(c) + 1] =
        base[static_cast<size_t>(c)] + chunk_rows_out[c];
  *n_rows_out = base[static_cast<size_t>(c_total)];
  if (*n_rows_out > max_rows_budget) return 1;
  for (int bad : seg_bad)
    if (bad) return 2;

  // pass 2: emit bits (parallel over segments; disjoint output ranges)
  parallel_for(n_segments, [&](int64_t si) {
    const int64_t k = seg_factor[static_cast<size_t>(si)];
    const int64_t bi = seg_image[static_cast<size_t>(si)];
    const int64_t m = ms[k], r = rs[k], per = m * r;
    const int8_t* buf = factor_bufs[k] + bi * r * m;
    std::vector<int32_t> run(static_cast<size_t>(r), 0);
    int64_t cid = seg_chunk0[static_cast<size_t>(si)];
    // chunk register: worst case chunk * max_len bits (max_len from
    // the PASSED code table — a hardcoded cap would heap-overflow on
    // longer codes)
    std::vector<uint32_t> reg(
        static_cast<size_t>(main_words) +
        (static_cast<size_t>(chunk) * static_cast<size_t>(max_len) + 31) / 32 +
        2);
    std::fill(reg.begin(), reg.end(), 0u);
    int64_t bitpos = 0, in_chunk = 0, mi = 0, ri = 0;
    const int64_t padded = ((per + chunk - 1) / chunk) * chunk;
    for (int64_t v = 0; v < padded; ++v) {
      int32_t zz = 0;
      if (v < per) {
        const int32_t x = buf[ri * m + mi];
        const int32_t d = x - run[static_cast<size_t>(ri)];
        run[static_cast<size_t>(ri)] = x;
        zz = d >= 0 ? 2 * d : -2 * d - 1;
        if (zz >= alphabet) zz = 0;  // pass 1 already flagged the segment
        if (++ri == r) {
          ri = 0;
          ++mi;
        }
      }
      const uint32_t code = codes[zz];
      const int32_t len = lens[zz];
      const int64_t w = bitpos >> 5, off = bitpos & 31;
      reg[static_cast<size_t>(w)] |= code << off;
      if (off != 0)
        reg[static_cast<size_t>(w) + 1] |= code >> (32 - off);
      bitpos += len;
      if (++in_chunk == chunk) {
        in_chunk = 0;
        uint32_t* mp = main_out + cid * main_words;
        for (int64_t j = 0; j < main_words; ++j)
          mp[j] = reg[static_cast<size_t>(j)];
        const int64_t rows = chunk_rows_out[cid];
        uint32_t* ep = exc_out + base[static_cast<size_t>(cid)] * row_words;
        for (int64_t j = 0; j < rows * row_words; ++j)
          ep[j] = reg[static_cast<size_t>(main_words + j)];
        std::fill(reg.begin(), reg.end(), 0u);
        bitpos = 0;
        ++cid;
      }
    }
  });
  return 0;
}

// Bit-pack int8 factor values into uint32 words for the decode H2D upload.
//
// Inputs are the per-factor FIBER-MAJOR inflate outputs (factor k: shape
// (B * R_k, M_k), row b*R_k + r = column r of image b) — i.e. exactly what
// `lrf_decompress_fibers` wrote, with no transpose/restack pass in between.
// Output: per image, the value stream [factor 0 row-major (m, r), factor 1,
// ...] packed `vals_per_word` values per uint32 (value v stored as
// (v - lo) << (bits * slot)), `words_per_image` words per image — the same
// layout `parallel/decode._inflate_streams` builds in numpy, fused into one
// C++ pass (the numpy route's transpose + concat + widen + shift-reduce
// temporaries measured ~37 ms/batch64 on the 2-core host; this measures
// ~2 ms). Returns nonzero if any value falls outside [lo, lo + 2^bits):
// the caller then falls back to the unpacked upload (the correctness guard
// the numpy path implemented with a min/max scan).
int lrf_pack_values(const int8_t* const* factor_bufs, int64_t n_factors,
                    int64_t b, const int64_t* ms, const int64_t* rs,
                    int32_t lo, int32_t bits, int64_t words_per_image,
                    uint32_t* out) {
  const int vals_per_word = 30 / bits;
  const uint32_t limit = 1u << bits;
  std::vector<int> rcs(static_cast<size_t>(b), 0);
  parallel_for(b, [&](int64_t bi) {
    uint32_t* dst = out + bi * words_per_image;
    uint32_t acc = 0;
    int slot = 0;
    int bad = 0;
    for (int64_t k = 0; k < n_factors; ++k) {
      const int64_t m = ms[k], r = rs[k];
      const int8_t* buf = factor_bufs[k] + bi * r * m;
      for (int64_t mi = 0; mi < m; ++mi) {
        for (int64_t ri = 0; ri < r; ++ri) {
          uint32_t v =
              static_cast<uint32_t>(static_cast<int32_t>(buf[ri * m + mi]) - lo);
          bad |= (v >= limit);
          acc |= (v & (limit - 1)) << (bits * slot);
          if (++slot == vals_per_word) {
            *dst++ = acc;
            acc = 0;
            slot = 0;
          }
        }
      }
    }
    if (slot != 0) *dst++ = acc;
    rcs[static_cast<size_t>(bi)] = bad;
  });
  for (int rc : rcs)
    if (rc != 0) return 1;
  return 0;
}

}  // extern "C"
