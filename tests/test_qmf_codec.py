"""End-to-end QMF codec tests: round-trips, reference cross-decode parity,
and the README quick-start numeric anchors.
"""

import numpy as np
import pytest

from lrf_tpu.models.container import bytes_to_dict, separate_bytes
from lrf_tpu.models.qmf import qmf_decode, qmf_encode, qmf_rank
from lrf_tpu.utils.metrics import bits_per_pixel, compression_ratio, psnr, ssim

RNG = np.random.default_rng(3)


def _rand_image(h, w):
    return RNG.integers(0, 256, (3, h, w)).astype(np.uint8)


class TestRoundtrip:
    @pytest.mark.parametrize("size", [(64, 64), (50, 70)])
    def test_ycbcr_patch(self, size):
        img = _rand_image(*size)
        enc = qmf_encode(img, quality=30)
        dec = qmf_decode(enc)
        assert dec.shape == img.shape and dec.dtype == np.uint8

    def test_rgb_patch(self):
        img = _rand_image(48, 64)
        enc = qmf_encode(img, quality=10, color_space="RGB")
        dec = qmf_decode(enc)
        assert dec.shape == img.shape

    def test_rgb_nopatch(self):
        img = _rand_image(40, 56)
        enc = qmf_encode(img, rank=8, color_space="RGB", patch=False)
        dec = qmf_decode(enc)
        assert dec.shape == img.shape

    def test_ycbcr_nopatch(self):
        img = _rand_image(40, 56)
        enc = qmf_encode(img, rank=8, patch=False)
        dec = qmf_decode(enc)
        assert dec.shape == img.shape

    def test_rank_tuple(self):
        img = _rand_image(32, 32)
        enc = qmf_encode(img, rank=(6, 3, 3))
        meta = bytes_to_dict(separate_bytes(enc, 2)[0])
        assert meta["rank"] == [6, 3, 3]

    def test_scalar_rank_split(self):
        img = _rand_image(32, 32)
        enc = qmf_encode(img, rank=7)
        meta = bytes_to_dict(separate_bytes(enc, 2)[0])
        assert meta["rank"] == [7, 3, 3]

    def test_quality_improves_fidelity(self):
        img = np.asarray(
            np.stack(
                [np.linspace(0, 255, 64 * 64).reshape(64, 64).astype(np.uint8)] * 3
            )
        )
        low = qmf_decode(qmf_encode(img, quality=3))
        high = qmf_decode(qmf_encode(img, quality=40))
        assert float(psnr(img, high)) > float(psnr(img, low))


def qmf_rank_reference(size, cr):
    import math

    return max(math.floor(size[0] * size[1] / (cr * (size[0] + size[1]))), 1)


class TestRank:
    def test_qmf_rank(self):
        assert qmf_rank((6144, 64), 10.0) == qmf_rank_reference((6144, 64), 10.0)


class TestReferenceParity:
    """Cross-decoding between our codec and the reference (torch) codec."""

    @pytest.mark.parametrize(
        "kwargs",
        [
            dict(quality=7),
            dict(quality=25),
            dict(rank=(6, 3, 3)),
            dict(quality=10, color_space="RGB"),
            dict(rank=4, color_space="RGB", patch=False),
            dict(rank=4, patch=False),
            dict(quality=12, patch_size=(16, 16)),
            dict(quality=12, bounds=(-8, 7)),
        ],
    )
    def test_reference_decodes_our_bytes_identically(self, ref_lrf, kodim01, kwargs):
        img = kodim01[:, :128, :160]
        ours = qmf_encode(img, **kwargs)
        ref_dec = ref_lrf.qmf_decode(ours).numpy()
        our_dec = qmf_decode(ours)
        np.testing.assert_array_equal(ref_dec, our_dec)

    def test_we_decode_reference_bytes_identically(self, ref_lrf, kodim01):
        import torch

        img = kodim01[:, :128, :160]
        theirs = ref_lrf.qmf_encode(torch.tensor(img), quality=7)
        ref_dec = ref_lrf.qmf_decode(theirs).numpy()
        our_dec = qmf_decode(theirs)
        np.testing.assert_array_equal(ref_dec, our_dec)

    def test_metadata_identical(self, ref_lrf, kodim01):
        import torch

        img = kodim01[:, :128, :160]
        ours = qmf_encode(img, quality=7)
        theirs = ref_lrf.qmf_encode(torch.tensor(img), quality=7)
        ours_meta = bytes_to_dict(separate_bytes(ours, 2)[0])
        theirs_meta = bytes_to_dict(separate_bytes(theirs, 2)[0])
        assert ours_meta == theirs_meta

    @pytest.mark.parametrize(
        "kwargs",
        [
            dict(quality=7),
            dict(quality=10, color_space="RGB"),
            dict(quality=15, color_space="RGB", patch=False),
            dict(quality=15, patch=False),
        ],
    )
    def test_metadata_identical_all_paths(self, ref_lrf, kodim01, kwargs):
        # Metadata (incl. the quality->rank mapping) must match the reference
        # exactly in every color-space x patch combination.
        import torch

        img = kodim01[:, :128, :160]
        ours_meta = bytes_to_dict(separate_bytes(qmf_encode(img, **kwargs), 2)[0])
        theirs_meta = bytes_to_dict(
            separate_bytes(ref_lrf.qmf_encode(torch.tensor(img), **kwargs), 2)[0]
        )
        assert ours_meta == theirs_meta

    def test_compressed_size_close_to_reference(self, ref_lrf, kodim01):
        import torch

        img = kodim01[:, :256, :256]
        for quality in (5, 15, 30):
            ours = len(qmf_encode(img, quality=quality))
            theirs = len(ref_lrf.qmf_encode(torch.tensor(img), quality=quality))
            # Different SVD-init basins give slightly different factors; the
            # stream stays within a few percent of the reference payload.
            assert ours <= theirs * 1.06, (quality, ours, theirs)

    def test_rd_close_to_reference(self, ref_lrf, kodim01):
        import torch

        img = kodim01[:, :256, :256]
        ours = qmf_decode(qmf_encode(img, quality=10))
        theirs = ref_lrf.qmf_decode(
            ref_lrf.qmf_encode(torch.tensor(img), quality=10)
        ).numpy()
        ours_psnr = float(psnr(img, ours))
        theirs_psnr = float(psnr(img, theirs))
        assert abs(ours_psnr - theirs_psnr) < 0.3, (ours_psnr, theirs_psnr)
