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


class TestDpackDecodeTransport:
    """Decode-direction entropy transport: C++ host encoder
    (fibercodec.cpp::lrf_dpack_encode) + chunk-parallel device decoder
    (ops.E.unpack_chunks_device)."""

    def _factors(self, rng, shapes, lo=-16, hi=15):
        return [
            np.clip(
                np.cumsum(rng.integers(-2, 3, s), axis=1), lo, hi
            ).astype(np.int8)
            for s in shapes
        ]

    def test_cpp_encoder_matches_device_packer(self):
        from lrf_tpu.native import fibercodec as native

        if not native.available() or not hasattr(
            native._load(), "lrf_dpack_encode"
        ):
            pytest.skip("native dpack encoder not built")
        rng = np.random.default_rng(11)
        shapes = [(3, 200, 5), (3, 60, 2)]
        factors = self._factors(rng, shapes)
        raws = [
            np.ascontiguousarray(f.transpose(0, 2, 1)).reshape(-1, f.shape[1])
            for f in factors
        ]
        budget = E.default_exc_rows(
            sum(b * (-(-m * r // E.CHUNK)) for b, m, r in shapes)
        )
        out = native.dpack_encode(
            raws, 3, [m for _, m, _ in shapes], [r for *_, r in shapes],
            E.LENS, E.CODES, E.CHUNK,
            E.MAIN_WORDS, E.ROW_WORDS, budget,
        )
        assert out is not None
        main, exc, chunk_rows, n_rows = out
        _, main_j, exc_j = E.pack_segments(
            [jnp.asarray(f, jnp.int32) for f in factors], max_exc_rows=budget
        )
        np.testing.assert_array_equal(main, np.asarray(main_j))
        np.testing.assert_array_equal(exc, np.asarray(exc_j))

    def test_device_decoder_round_trip(self):
        from lrf_tpu.native import fibercodec as native

        if not native.available() or not hasattr(
            native._load(), "lrf_dpack_encode"
        ):
            pytest.skip("native dpack encoder not built")
        rng = np.random.default_rng(12)
        # incl. an adversarial extreme-delta factor (max continuation rows)
        shapes = [(2, 300, 6), (2, 100, 4)]
        factors = self._factors(rng, shapes[:1])
        factors.append(
            np.where(rng.random(shapes[1]) < 0.5, -16, 15).astype(np.int8)
        )
        raws = [
            np.ascontiguousarray(f.transpose(0, 2, 1)).reshape(-1, f.shape[1])
            for f in factors
        ]
        budget = E.MAX_ROWS * sum(
            b * (-(-m * r // E.CHUNK)) for b, m, r in shapes
        )
        main, exc, chunk_rows, n_rows = native.dpack_encode(
            raws, 2, [m for _, m, _ in shapes], [r for *_, r in shapes],
            E.LENS, E.CODES, E.CHUNK,
            E.MAIN_WORDS, E.ROW_WORDS, budget,
        )
        vals = E.unpack_chunks_device(
            jnp.asarray(chunk_rows), jnp.asarray(main), jnp.asarray(exc),
            shapes,
        )
        for f, v in zip(factors, vals):
            np.testing.assert_array_equal(np.asarray(v), f.astype(np.int32))

    def test_dpack_decode_end_to_end(self, monkeypatch):
        import jax

        from lrf_tpu.models.qmf import qmf_decode, qmf_encode
        from lrf_tpu.native import fibercodec as native
        from lrf_tpu.parallel import decode as dec
        from lrf_tpu.parallel.encode import sharded_qmf_encode_batch
        from lrf_tpu.parallel.mesh import make_mesh

        if not native.available() or not hasattr(
            native._load(), "lrf_dpack_encode"
        ):
            pytest.skip("native dpack encoder not built")
        monkeypatch.setenv("LRF_TPU_DECODE_TRANSPORT", "dpack")
        rng = np.random.default_rng(13)
        # smooth-ish images: pure noise overflows the continuation-row
        # budget, which (correctly) falls back to the flat pack and would
        # skip the path under test
        yy, xx = np.mgrid[:48, :64]
        base = (yy * 2 + xx + rng.integers(0, 8, (48, 64))) % 256
        batch = np.stack(
            [np.stack([np.roll(base, i + c, axis=1) for c in range(3)])
             for i in range(4)]
        ).astype(np.uint8)
        mesh = make_mesh(data=1, patch=1, devices=jax.devices()[:1])
        streams = sharded_qmf_encode_batch(batch, mesh, quality=20, num_iters=2)
        dec._PACK_DECISIONS.clear()
        inflated = dec._inflate_streams(streams, True)
        assert inflated[4][0] == "dpack"
        imgs = dec.sharded_qmf_decode_batch(streams, mesh)
        for i in (0, 3):
            np.testing.assert_array_equal(
                imgs[i], np.asarray(qmf_decode(streams[i]))
            )


class TestAdaptiveExcBudget:
    """The continuation-row budget hint: grows on overflow/near-budget,
    shrinks to a rolling p99 (quantized, >=10% saving only — no
    recompile churn), and overrides the static default in both
    directions when building the encoder."""

    def _spec(self, budget, key=(("probe", 1),)):
        return {"exc_budget": budget, "shapes": key}

    def setup_method(self):
        from lrf_tpu.parallel import encode as enc

        enc._EXC_ROWS_HINT.clear()
        enc._EXC_ROWS_OBS.clear()

    def test_overflow_grows_with_headroom(self):
        from lrf_tpu.parallel import encode as enc

        key = (("g", 1),)
        enc._observe_entropy_rows(self._spec(1000, key), 1500, True)
        assert enc._EXC_ROWS_HINT[key] == 1500 + (1500 >> 2) + 64

    def test_shrink_waits_for_history_then_quantizes(self):
        from lrf_tpu.parallel import encode as enc

        key = (("s", 1),)
        for i in range(enc._SHRINK_MIN_OBS - 1):
            enc._observe_entropy_rows(self._spec(60000, key), 30000 + i, False)
        assert key not in enc._EXC_ROWS_HINT  # not enough observations yet
        enc._observe_entropy_rows(self._spec(60000, key), 30007, False)
        hint = enc._EXC_ROWS_HINT[key]
        assert hint % 1024 == 0 and hint < 60000
        assert hint >= int(30007 * enc._SHRINK_MARGIN)
        # stable usage must not churn the hint (same quantized target)
        for i in range(8):
            enc._observe_entropy_rows(self._spec(hint, key), 30000 + i, False)
        assert enc.ENTROPY_STATS["budget_shrinks"] >= 1
        assert enc._EXC_ROWS_HINT[key] == hint

    def test_small_saving_not_adopted(self):
        from lrf_tpu.parallel import encode as enc

        key = (("t", 1),)
        # usage ~97% of budget: the <10%-saving shrink must not trigger
        # (and near-budget growth only fires within 5%)
        for i in range(enc._SHRINK_MIN_OBS + 2):
            enc._observe_entropy_rows(self._spec(40960, key), 38000 + i, False)
        assert key not in enc._EXC_ROWS_HINT

    def test_hint_overrides_static_default_both_directions(self):
        import jax

        from lrf_tpu.parallel import encode as enc
        from lrf_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(data=1, patch=1, devices=jax.devices()[:1])
        _, _, spec = enc.build_sharded_encoder(
            mesh, (48, 64), quality=20, batch=4, pack="entropy"
        )
        default = spec["exc_budget"]
        for hint in (default // 2, default * 2):
            enc._EXC_ROWS_HINT[spec["shapes"]] = hint
            _, _, spec2 = enc.build_sharded_encoder(
                mesh, (48, 64), quality=20, batch=4, pack="entropy"
            )
            assert spec2["exc_budget"] == hint
