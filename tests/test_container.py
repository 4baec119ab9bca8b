"""Bitstream container tests: round-trips plus byte parity with the reference."""

import numpy as np
import pytest

from lrf_tpu.models.container import (
    bytes_to_dict,
    combine_bytes,
    decode_matrix,
    decode_tensor,
    dict_to_bytes,
    encode_matrix,
    encode_tensor,
    separate_bytes,
)

RNG = np.random.default_rng(7)


class TestFraming:
    def test_combine_separate_roundtrip(self):
        payloads = [b"alpha", b"", b"gamma" * 100, b"\x00\xff"]
        combined = combine_bytes(payloads)
        assert separate_bytes(combined, len(payloads)) == tuple(payloads)

    def test_dict_roundtrip(self):
        d = {"color space": "YCbCr", "rank": [4, 2, 2], "patch": True}
        assert bytes_to_dict(dict_to_bytes(d)) == d

    def test_framing_is_length_prefixed_big_endian(self):
        combined = combine_bytes([b"ab", b"cd"])
        assert combined == b"\x00\x00\x00\x02abcd"


class TestTensorCoder:
    @pytest.mark.parametrize("dtype", [np.int8, np.uint8, np.float32, np.int16])
    def test_matrix_roundtrip(self, dtype):
        m = RNG.integers(-100, 100, (37, 5)).astype(dtype)
        out = decode_matrix(encode_matrix(m))
        np.testing.assert_array_equal(out, m)

    def test_matrix_row_mode(self):
        m = RNG.integers(-100, 100, (6, 40)).astype(np.int8)
        out = decode_matrix(encode_matrix(m, mode="row"))
        np.testing.assert_array_equal(out, m)

    @pytest.mark.parametrize("shape", [(3, 10, 4), (2, 2, 2, 2)])
    def test_nd_tensor_roundtrip(self, shape):
        t = RNG.standard_normal(shape).astype(np.float32)
        out = decode_tensor(encode_tensor(t))
        np.testing.assert_array_equal(out, t)

    def test_2d_dispatches_to_matrix_coder(self):
        m = RNG.integers(-5, 5, (10, 3)).astype(np.int8)
        blob = encode_tensor(m)
        meta = bytes_to_dict(separate_bytes(blob, 2)[0])
        assert meta["num_fibers"] == 3 and meta["mode"] == "col"


class TestReferenceParity:
    def test_matrix_bytes_identical(self, ref_lrf):
        import torch

        m = RNG.integers(-16, 16, (64, 7)).astype(np.int8)
        theirs = ref_lrf.encode_matrix(torch.tensor(m))
        # the zlib backend is the strict byte-parity contract
        assert encode_matrix(m, coder="zlib") == theirs
        # the default ("best") coder must never exceed the reference's
        # bytes and must stay reference-decodable
        ours = encode_matrix(m)
        assert len(ours) <= len(theirs)
        np.testing.assert_array_equal(ref_lrf.decode_matrix(ours).numpy(), m)

    def test_nd_bytes_identical(self, ref_lrf):
        import torch

        t = RNG.integers(-16, 16, (1, 33, 4)).astype(np.int8)
        theirs = ref_lrf.encode_tensor(torch.tensor(t))
        assert encode_tensor(t, coder="zlib") == theirs
        ours = encode_tensor(t)
        assert len(ours) <= len(theirs)
        np.testing.assert_array_equal(ref_lrf.decode_tensor(ours).numpy(), t)

    def test_cross_decode(self, ref_lrf):
        import torch

        m = RNG.integers(-16, 16, (64, 7)).astype(np.int8)
        theirs = ref_lrf.encode_matrix(torch.tensor(m))
        np.testing.assert_array_equal(decode_matrix(theirs), m)
        ours = encode_matrix(m)
        np.testing.assert_array_equal(ref_lrf.decode_matrix(ours).numpy(), m)

    def test_reference_decodes_deflate_streams(self, ref_lrf):
        """libdeflate-coded fibers are standard zlib streams; the reference
        decoder must read them unchanged (and they must be no larger)."""
        import pytest

        from lrf_tpu.native import fibercodec

        if not fibercodec.available():
            pytest.skip("libfibercodec.so not built")
        m = RNG.integers(-16, 16, (512, 7)).astype(np.int8)
        ours = encode_matrix(m, coder="deflate")
        np.testing.assert_array_equal(ref_lrf.decode_matrix(ours).numpy(), m)
        nd = RNG.integers(-16, 16, (2, 33, 4)).astype(np.int8)
        blob = encode_tensor(nd, coder="deflate")
        np.testing.assert_array_equal(ref_lrf.decode_tensor(blob).numpy(), nd)
