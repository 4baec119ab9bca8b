"""Device-side entropy coder: table construction + pack/decode round-trips."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lrf_tpu.ops import entropy as E

RNG = np.random.default_rng(5)


def _random_factors(shapes, p=None):
    p = E._HIST / E._HIST.sum() if p is None else p
    return [RNG.choice(32, s, p=p).astype(np.int8) - 16 for s in shapes]


def _flatten(factors):
    return np.concatenate(
        [f.reshape(f.shape[0], -1).astype(np.int32).ravel() for f in factors]
    )


def _pack(factors):
    fn = jax.jit(lambda *f: E.pack_segments(list(f), -16))
    seg_base, main, exc = fn(*[jnp.asarray(f) for f in factors])
    return np.asarray(seg_base), np.asarray(main), np.asarray(exc)


class TestHuffmanTable:
    def test_canonical_and_complete(self):
        lens, codes = E.LENS, E.CODES
        assert len(lens) == 32 and lens.max() <= E.MAX_LEN and lens.min() >= 1
        # Kraft equality: the code is complete (a full prefix tree)
        assert sum(2.0 ** -int(l) for l in lens) == pytest.approx(1.0)
        # prefix-free under LSB-first reading: no code is a bit-prefix of
        # another (mask the shorter length and compare)
        for a in range(32):
            for b in range(32):
                if a == b:
                    continue
                la = int(lens[a])
                if la <= int(lens[b]):
                    assert (int(codes[b]) & ((1 << la) - 1)) != int(codes[a]), (a, b)

    def test_expected_rate_beats_flat_pack(self):
        assert E.expected_bits_per_value() < 3.5  # vs 5.0 flat


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
        n_ovf = int(seg_base[-1])
        dec = E.decode_segments_py(
            main, exc[: n_ovf * E.TAIL_WORDS], seg_base, values, -16
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
        n_ovf = int(seg_base[-1])
        out = fibercodec.huffman_decode_segments(
            main, exc[: n_ovf * E.TAIL_WORDS], seg_base, values,
            E.LENS, E.CODES, E.CHUNK, E.MAIN_WORDS, E.TAIL_WORDS, -16,
        )
        assert out is not None
        assert np.array_equal(out.astype(np.int32), _flatten(factors))

    def test_adversarial_all_longest_codes(self):
        # Every chunk overflows into its exception tail; the worst-case
        # symbol stream must still round-trip (this is the correctness
        # backstop for images unlike the static table's distribution).
        worst = int(np.argmax(E.LENS)) - 16
        shapes = [(1, 256, 2)]
        factors = [np.full(shapes[0], worst, np.int8)]
        seg_base, main, exc = _pack(factors)
        n_ovf = int(seg_base[-1])
        assert n_ovf == -(-256 * 2 // E.CHUNK)  # all chunks overflowed
        values, _, _ = E.segment_layout(shapes)
        dec = E.decode_segments_py(
            main, exc[: n_ovf * E.TAIL_WORDS], seg_base, values, -16
        )
        assert np.array_equal(dec, _flatten(factors))

    def test_all_symbols_coverage(self):
        # every alphabet symbol in one stream
        vals = np.tile(np.arange(-16, 16, dtype=np.int8), 8)
        factors = [vals.reshape(1, 32, 8)]
        seg_base, main, exc = _pack(factors)
        values, _, _ = E.segment_layout([(1, 32, 8)])
        n_ovf = int(seg_base[-1])
        dec = E.decode_segments_py(
            main, exc[: n_ovf * E.TAIL_WORDS], seg_base, values, -16
        )
        assert np.array_equal(dec, _flatten(factors))
