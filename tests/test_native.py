"""Native fiber codec tests: byte parity with the pure-Python zlib path."""

import zlib

import numpy as np
import pytest

from lrf_tpu.models.container import (
    decode_matrix,
    encode_matrix,
    encode_matrix_batch,
    encode_tensor_batch,
    encode_tensor,
)
from lrf_tpu.native import fibercodec

RNG = np.random.default_rng(13)

needs_native = pytest.mark.skipif(
    not fibercodec.available(), reason="libfibercodec.so not built"
)


@needs_native
class TestNative:
    @pytest.mark.parametrize("dtype", [np.int8, np.uint8, np.float32])
    @pytest.mark.parametrize("mode", ["col", "row"])
    def test_compress_matches_python_zlib(self, dtype, mode):
        m = RNG.integers(-16, 16, (257, 9)).astype(dtype)
        got = fibercodec.compress_fibers(m, mode)
        if mode == "col":
            expected = [
                zlib.compress(np.ascontiguousarray(m[:, i : i + 1]).tobytes(), 9)
                for i in range(m.shape[1])
            ]
        else:
            expected = [
                zlib.compress(np.ascontiguousarray(m[i : i + 1, :]).tobytes(), 9)
                for i in range(m.shape[0])
            ]
        assert got == expected

    def test_decompress_roundtrip(self):
        m = RNG.integers(-128, 128, (100, 7)).astype(np.int8)
        blobs = fibercodec.compress_fibers(m, "col")
        back = fibercodec.decompress_fibers(blobs, np.dtype(np.int8), "col")
        np.testing.assert_array_equal(back, m)

    def test_container_uses_native_with_identical_bytes(self):
        # encode_matrix must produce identical bytes whether or not the
        # native path is used.
        m = RNG.integers(-16, 16, (64, 5)).astype(np.int8)
        with_native = encode_matrix(m)
        import lrf_tpu.models.container as C

        orig = C._native
        class _Off:
            @staticmethod
            def compress_fibers(*a, **k):
                return None

            @staticmethod
            def decompress_fibers(*a, **k):
                return None

        try:
            C._native = _Off
            without_native = encode_matrix(m)
        finally:
            C._native = orig
        assert with_native == without_native
        np.testing.assert_array_equal(decode_matrix(with_native), m)


class TestBatchedSerialization:
    def test_matrix_batch_matches_unbatched(self):
        t = RNG.integers(-16, 16, (6, 40, 3)).astype(np.int8)
        batched = encode_matrix_batch(t)
        unbatched = [encode_matrix(t[i]) for i in range(6)]
        assert batched == unbatched

    def test_tensor_batch_nd(self):
        t = RNG.integers(-16, 16, (4, 1, 20, 3)).astype(np.int8)
        batched = encode_tensor_batch(t)
        unbatched = [encode_tensor(t[i]) for i in range(4)]
        assert batched == unbatched
