"""Device-side entropy coder (delta + zigzag Huffman): table construction,
staircase code arithmetic, pack/decode round-trips, native decoder parity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lrf_tpu.ops import entropy as E

RNG = np.random.default_rng(5)


def _random_factors(shapes):
    """Mixed smooth + noisy integer factors within the canonical bounds."""
    factors = []
    for s in shapes:
        noise = RNG.integers(-16, 16, s).astype(np.int8)
        smooth = np.clip(
            np.cumsum(RNG.integers(-1, 2, s), axis=1), -16, 15
        ).astype(np.int8)
        factors.append(np.where(RNG.random(s) < 0.7, smooth, noise))
    return factors


def _flatten(factors):
    return np.concatenate(
        [f.reshape(f.shape[0], -1).astype(np.int32).ravel() for f in factors]
    )


def _pack(factors, max_exc_rows=8192):
    fn = jax.jit(lambda *f: E.pack_segments(list(f), max_exc_rows=max_exc_rows))
    seg_base, main, exc = fn(*[jnp.asarray(f) for f in factors])
    return np.asarray(seg_base), np.asarray(main), np.asarray(exc)


class TestHuffmanTable:
    def test_canonical_monotone_complete(self):
        lens, codes = E.LENS, E.CODES
        assert len(lens) == 63 and lens.min() >= 1 and lens.max() <= E.MAX_LEN
        # monotone in zigzag order (what makes the staircase encode valid)
        assert np.all(np.diff(lens) >= 0)
        # Kraft equality: the code is complete (a full prefix tree)
        assert sum(2.0 ** -int(l) for l in lens) == pytest.approx(1.0)
        # prefix-free under LSB-first reading
        for a in range(63):
            for b in range(63):
                if a == b:
                    continue
                la = int(lens[a])
                if la <= int(lens[b]):
                    assert (int(codes[b]) & ((1 << la) - 1)) != int(codes[a])

    def test_staircase_matches_table(self):
        zz = jnp.arange(63, dtype=jnp.int32)
        ln, codes = E._encode_symbols(zz)
        assert np.array_equal(np.asarray(ln), E.LENS)
        assert np.array_equal(np.asarray(codes), E.CODES)

    def test_expected_rate_beats_flat_pack(self):
        assert E.expected_bits_per_value() < 2.5  # vs 5.0 flat


class TestRoundTrip:
    @pytest.mark.parametrize(
        "shapes",
        [
            [(3, 100, 6), (3, 64, 6), (3, 37, 3)],
            [(1, 64, 1)],
            [(2, 1, 1), (2, 63, 1)],  # sub-chunk segments
        ],
    )
    def test_python_decoder(self, shapes):
        factors = _random_factors(shapes)
        seg_base, main, exc = _pack(factors)
        values, _, _ = E.segment_layout(shapes)
        ranks = E.segment_ranks(shapes)
        n_rows = int(seg_base[-1])
        dec = E.decode_segments_py(
            main, exc[: n_rows * E.ROW_WORDS], seg_base, values, ranks
        )
        assert np.array_equal(dec, _flatten(factors))

    def test_native_decoder_matches(self):
        fibercodec = pytest.importorskip("lrf_tpu.native.fibercodec")
        if not fibercodec.available():
            pytest.skip("native lib not built")
        shapes = [(2, 768, 6), (2, 64, 6), (2, 192, 3)]
        factors = _random_factors(shapes)
        seg_base, main, exc = _pack(factors)
        values, _, _ = E.segment_layout(shapes)
        ranks = E.segment_ranks(shapes)
        n_rows = int(seg_base[-1])
        out = fibercodec.dpack_decode_segments(
            main, exc[: n_rows * E.ROW_WORDS], seg_base, values, ranks,
            E.LENS, E.CODES, E.CHUNK, E.MAIN_WORDS, E.ROW_WORDS,
        )
        assert out is not None
        assert np.array_equal(out.astype(np.int32), _flatten(factors))

    def test_adversarial_extreme_deltas(self):
        # alternating bound-to-bound values: every delta is +/-31, the
        # longest codes everywhere, every chunk spilling the maximum
        # continuation rows — the correctness backstop for data unlike the
        # static table's distribution.
        worst = np.empty((1, 256, 2), np.int8)
        worst[:, 0::2, :] = -16
        worst[:, 1::2, :] = 15
        shapes = [worst.shape]
        seg_base, main, exc = _pack([worst])
        n_rows = int(seg_base[-1])
        assert n_rows == (256 * 2 // E.CHUNK) * E.MAX_ROWS  # max spill
        values, _, _ = E.segment_layout(shapes)
        dec = E.decode_segments_py(
            main, exc[: n_rows * E.ROW_WORDS], seg_base, values, [2]
        )
        assert np.array_equal(dec, _flatten([worst]))
        # the PRODUCTION native decoder must survive the same worst case:
        # all-max-length chunks make the lookahead peek one row past
        # max_rows (the round-2 ASan heap-overflow regression)
        from lrf_tpu.native import fibercodec

        if fibercodec.available():
            out = fibercodec.dpack_decode_segments(
                main, exc[: n_rows * E.ROW_WORDS], seg_base, values, [2],
                E.LENS, E.CODES, E.CHUNK, E.MAIN_WORDS, E.ROW_WORDS,
            )
            assert out is not None
            assert np.array_equal(out.astype(np.int32), _flatten([worst]))

    def test_all_delta_symbols_coverage(self):
        # a walk that exercises every delta in [-31, 31]: values ping-pong
        # with every step size
        steps = np.concatenate([np.arange(-31, 32), np.arange(31, -32, -1)])
        vals = np.clip(np.cumsum(np.tile(steps, 3)), -16, 15)
        m = len(vals) - len(vals) % 4
        factors = [vals[:m].reshape(1, -1, 4).astype(np.int8)]
        seg_base, main, exc = _pack(factors)
        values, _, _ = E.segment_layout([factors[0].shape])
        n_rows = int(seg_base[-1])
        dec = E.decode_segments_py(
            main, exc[: n_rows * E.ROW_WORDS], seg_base, values, [4]
        )
        assert np.array_equal(dec, _flatten(factors))

    def test_budget_overflow_reported(self):
        # truncated budget: seg_base[-1] still reports the true row count so
        # callers can detect the truncation and fall back
        worst = np.empty((1, 256, 2), np.int8)
        worst[:, 0::2, :] = -16
        worst[:, 1::2, :] = 15
        seg_base, main, exc = _pack([worst], max_exc_rows=4)
        assert int(seg_base[-1]) > 4
        assert exc.size == 4 * E.ROW_WORDS
