"""HOSVD / Tensor-Train factorization and codec tests, with reference
cross-checks on mode products and reconstruction quality."""

import numpy as np
import pytest
import jax.numpy as jnp

from lrf_tpu.models.hosvd import (
    hosvd_compression_ratio,
    hosvd_decode,
    hosvd_encode,
    hosvd_rank,
    patch_hosvd_decode,
    patch_hosvd_detensorize,
    patch_hosvd_encode,
    patch_hosvd_tensorize,
)
from lrf_tpu.ops.hosvd import (
    batched_hosvd,
    hosvd,
    hosvd_rank_feasible_ranges,
    hosvd_rank_upper_bounds,
    mode_product,
    multi_mode_product,
    unfold,
)
from lrf_tpu.ops.tt import (
    batched_contract_tt,
    batched_ttd,
    contract_tt,
    tt_rank_feasible_ranges,
    tt_rank_upper_bounds,
    ttd,
)
from lrf_tpu.utils.metrics import psnr

RNG = np.random.default_rng(9)


class TestModeOps:
    def test_unfold_matches_reference(self, ref_lrf):
        import torch
        from lrf.factorization.hosvd import unfold as ref_unfold

        x = RNG.standard_normal((3, 4, 5, 6)).astype(np.float32)
        for mode in range(4):
            ours = np.asarray(unfold(jnp.asarray(x), mode))
            theirs = ref_unfold(torch.tensor(x), mode).numpy()
            np.testing.assert_allclose(ours, theirs, atol=0)

    @pytest.mark.parametrize("transpose", [False, True])
    def test_mode_product_matches_reference(self, ref_lrf, transpose):
        import torch
        from lrf.factorization.hosvd import mode_product as ref_mp

        x = RNG.standard_normal((3, 4, 5)).astype(np.float32)
        m = RNG.standard_normal((4, 7) if transpose else (7, 4)).astype(np.float32)
        ours = np.asarray(mode_product(jnp.asarray(x), jnp.asarray(m), 1, transpose))
        theirs = ref_mp(torch.tensor(x), torch.tensor(m), 1, transpose).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-5)

    def test_multi_mode_product_matches_reference(self, ref_lrf):
        import torch
        from lrf.factorization.hosvd import multi_mode_product as ref_mmp

        x = RNG.standard_normal((3, 4, 5)).astype(np.float32)
        ms = [RNG.standard_normal((6, 3)), RNG.standard_normal((7, 4)), RNG.standard_normal((8, 5))]
        ms = [m.astype(np.float32) for m in ms]
        ours = np.asarray(multi_mode_product(jnp.asarray(x), [jnp.asarray(m) for m in ms]))
        theirs = ref_mmp(torch.tensor(x), [torch.tensor(m) for m in ms]).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-4)


class TestHOSVD:
    def test_full_rank_reconstructs(self):
        x = jnp.asarray(RNG.standard_normal((6, 7, 8)).astype(np.float32))
        core, factors = hosvd(x)
        recon = multi_mode_product(core, factors, transpose=False)
        np.testing.assert_allclose(np.asarray(recon), np.asarray(x), atol=1e-3)

    def test_truncated_error_reasonable(self):
        # low-rank tensor: exact recovery at the true rank
        a = RNG.standard_normal((6, 3)).astype(np.float32)
        b = RNG.standard_normal((7, 3)).astype(np.float32)
        c = RNG.standard_normal((8, 3)).astype(np.float32)
        core = RNG.standard_normal((3, 3, 3)).astype(np.float32)
        x = multi_mode_product(jnp.asarray(core), [jnp.asarray(a), jnp.asarray(b), jnp.asarray(c)])
        core2, factors = hosvd(x, rank=(3, 3, 3))
        recon = multi_mode_product(core2, factors, transpose=False)
        err = np.linalg.norm(np.asarray(recon - x)) / np.linalg.norm(np.asarray(x))
        assert err < 1e-3

    def test_batched(self):
        x = jnp.asarray(RNG.standard_normal((4, 5, 6, 7)).astype(np.float32))
        core, factors = batched_hosvd(x, rank=(2, 3, 4))
        assert core.shape == (4, 2, 3, 4)
        assert factors[0].shape == (4, 5, 2)

    def test_rank_bounds_match_reference(self, ref_lrf):
        from lrf.factorization.hosvd import (
            hosvd_rank_feasible_ranges as ref_ranges,
            hosvd_rank_upper_bounds as ref_bounds,
        )

        size = (100, 8, 8, 3)
        assert tuple(ref_bounds(size)) == hosvd_rank_upper_bounds(size)
        assert ref_ranges(size, 10.0, (None, None, None, 3)) == hosvd_rank_feasible_ranges(
            size, 10.0, (None, None, None, 3)
        )


class TestTT:
    def test_roundtrip_full_rank(self):
        x = jnp.asarray(RNG.standard_normal((5, 6, 7)).astype(np.float32))
        factors = ttd(x)
        recon = contract_tt(factors)
        np.testing.assert_allclose(np.asarray(recon), np.asarray(x), atol=1e-3)

    def test_truncated_shapes(self):
        x = jnp.asarray(RNG.standard_normal((5, 6, 7)).astype(np.float32))
        factors = ttd(x, rank=(2, 3))
        assert factors[0].shape == (5, 2)
        assert factors[1].shape == (2, 6, 3)
        assert factors[2].shape == (3, 7)

    def test_batched(self):
        x = jnp.asarray(RNG.standard_normal((4, 5, 6)).astype(np.float32))
        factors = batched_ttd(x, rank=(3,))
        recon = batched_contract_tt(factors)
        assert recon.shape == (4, 5, 6)

    def test_rank_bounds_match_reference(self, ref_lrf):
        from lrf.factorization.tt import (
            tt_rank_feasible_ranges as ref_ranges,
            tt_rank_upper_bounds as ref_bounds,
        )

        size = (64, 8, 8, 3)
        assert ref_bounds(size) == tt_rank_upper_bounds(size)
        assert ref_ranges(size, 8.0) == tt_rank_feasible_ranges(size, 8.0)


class TestHOSVDCodec:
    def test_whole_image_roundtrip(self, kodim01):
        img = kodim01[:, :64, :64]
        enc = hosvd_encode(img, rank=(3, 20, 20))
        dec = hosvd_decode(enc)
        assert dec.shape == img.shape and dec.dtype == np.uint8
        assert float(psnr(img, dec)) > 20

    def test_rank_from_cr_matches_reference(self, ref_lrf):
        from lrf.compression.hosvd import hosvd_rank as ref_rank

        for size, cr in [((3, 64, 96), 10.0), ((3, 128, 128), 25.0)]:
            assert ref_rank(size, cr) == hosvd_rank(size, cr)

    def test_compression_ratio_matches_reference(self, ref_lrf):
        from lrf.compression.hosvd import hosvd_compression_ratio as ref_cr

        size, rank = (100, 8, 8, 3), (20, 4, 4, 3)
        assert ref_cr(size, rank) == pytest.approx(hosvd_compression_ratio(size, rank))

    def test_tensorize_matches_reference(self, ref_lrf):
        import torch
        from lrf.compression.hosvd import patch_hosvd_tensorize as ref_t

        x = RNG.standard_normal((3, 24, 32)).astype(np.float32)
        ours = np.asarray(patch_hosvd_tensorize(jnp.asarray(x), (8, 8)))
        theirs = ref_t(torch.tensor(x), (8, 8)).numpy()
        np.testing.assert_allclose(ours, theirs, atol=0)
        back = np.asarray(patch_hosvd_detensorize(jnp.asarray(ours), (24, 32), (8, 8)))
        np.testing.assert_allclose(back, x, atol=0)

    def test_patch_roundtrip_with_rank(self, kodim01):
        img = kodim01[:, :64, :96]
        enc = patch_hosvd_encode(img, rank=(20, 4, 4, 3))
        dec = patch_hosvd_decode(enc)
        assert dec.shape == img.shape
        assert float(psnr(img, dec)) > 20

    def test_patch_roundtrip_with_bpp(self, kodim01):
        img = kodim01[:, :64, :96]
        enc = patch_hosvd_encode(img, bpp=0.6)
        dec = patch_hosvd_decode(enc)
        assert dec.shape == img.shape

    def test_odd_size_padding(self, kodim01):
        img = kodim01[:, :61, :93]
        enc = patch_hosvd_encode(img, rank=(16, 4, 4, 3))
        dec = patch_hosvd_decode(enc)
        assert dec.shape == img.shape
