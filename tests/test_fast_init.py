"""Opt-in randomized throughput init (`init="fast"` / method="randomized").

Round-5 eigh-floor work: the exact batched 64x64 Gram eigh dominates the
encode program's device time; the randomized Gram range-finder init cuts
it ~4x at a measured low-rank RD cost. These tests pin (a) numerical
sanity of the sketch, (b) the q=10 RD bound vs the exact init, (c)
determinism of the opt-in path, and (d) that the DEFAULT path is
untouched (byte contracts live elsewhere and must not move).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lrf_tpu.ops.svd import randomized_truncated_svd, truncated_svd


class TestRandomizedTSVD:
    def test_recovers_exact_lowrank(self):
        rng = np.random.default_rng(0)
        u = rng.standard_normal((200, 5))
        v = rng.standard_normal((64, 5))
        x = jnp.asarray(u @ np.diag([100, 50, 20, 10, 5]) @ v.T, jnp.float32)
        ur, sr, vr = randomized_truncated_svd(x, 5)
        ue, se, ve = truncated_svd(x, 5, method="gram")
        np.testing.assert_allclose(np.asarray(sr), np.asarray(se), rtol=1e-3)
        rec_r = ur * sr[None, :] @ vr.T
        np.testing.assert_allclose(
            np.asarray(rec_r), np.asarray(x), rtol=1e-2, atol=1e-2
        )

    def test_captured_mass_on_image_grams(self, kodim01):
        from lrf_tpu.ops.color import rgb_to_ycbcr
        from lrf_tpu.ops.patch import patchify

        img = kodim01[:, :512, :768]
        y = rgb_to_ycbcr(jnp.asarray(img[None], jnp.float32))[:, 0]
        xm = patchify(y[:, None], (8, 8))
        g = jnp.einsum("bmn,bmk->bnk", xm, xm)
        vr = truncated_svd(xm, 6, method="randomized")[2]
        ev, _ = jnp.linalg.eigh(g)
        top = jnp.sum(jnp.flip(ev, -1)[..., :6], -1)
        cap = jnp.einsum("bnr,bnm,bmr->b", vr, g, vr) / top
        assert float(jnp.min(cap)) > 0.995
        assert float(jnp.max(cap)) < 1.0 + 1e-3  # orthonormal: no blow-up

    def test_deterministic(self):
        x = jnp.asarray(
            np.random.default_rng(3).standard_normal((500, 64)), jnp.float32
        )
        a = randomized_truncated_svd(x, 6)
        b = randomized_truncated_svd(x, 6)
        for xa, xb in zip(a, b):
            np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))

    def test_wide_matrix_falls_back(self):
        x = jnp.asarray(
            np.random.default_rng(4).standard_normal((32, 64)), jnp.float32
        )
        u, s, v = truncated_svd(x, 4, method="randomized")
        ue, se, ve = truncated_svd(x, 4, method="gram")
        np.testing.assert_allclose(np.asarray(s), np.asarray(se), rtol=1e-4)


class TestFastInitEncoder:
    @pytest.fixture()
    def batch(self, kodim01):
        img = kodim01[:, :96, :128]
        return np.stack([np.roll(img, 9 * i, axis=2) for i in range(4)])

    def test_fast_init_rd_bound_q10(self, batch):
        # The pinned RD contract of the opt-in: dPSNR vs the exact init
        # >= -0.3 dB per image at q=10 on this data (measured typical:
        # mean -0.04, worst -0.13 on full-size kodim stacks).
        from lrf_tpu.models.qmf import qmf_decode
        from lrf_tpu.parallel.encode import sharded_qmf_encode_batch
        from lrf_tpu.parallel.mesh import make_mesh
        from lrf_tpu.utils.metrics import psnr

        mesh = make_mesh(data=1, patch=1, devices=jax.devices()[:1])
        exact = sharded_qmf_encode_batch(batch, mesh, quality=10)
        fast = sharded_qmf_encode_batch(batch, mesh, quality=10, init="fast")
        for i in range(len(batch)):
            p_e = float(psnr(batch[i], qmf_decode(exact[i])))
            p_f = float(psnr(batch[i], qmf_decode(fast[i])))
            assert p_f >= p_e - 0.3, (i, p_e, p_f)

    def test_fast_init_deterministic_bytes(self, batch):
        from lrf_tpu.parallel.encode import sharded_qmf_encode_batch
        from lrf_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(data=1, patch=1, devices=jax.devices()[:1])
        a = sharded_qmf_encode_batch(batch, mesh, quality=10, init="fast")
        b = sharded_qmf_encode_batch(batch, mesh, quality=10, init="fast")
        assert a == b

    def test_fast_init_streams_reference_decodable(self, batch, ref_lrf):
        from lrf_tpu.models.qmf import qmf_decode
        from lrf_tpu.parallel.encode import sharded_qmf_encode_batch
        from lrf_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(data=1, patch=1, devices=jax.devices()[:1])
        fast = sharded_qmf_encode_batch(batch, mesh, quality=10, init="fast")
        for i, stream in enumerate(fast):
            ours = qmf_decode(stream)
            theirs = np.asarray(ref_lrf.qmf_decode(stream))
            np.testing.assert_array_equal(ours, theirs)

    def test_default_init_unchanged(self, batch):
        # the byte-contract path must not move: init defaults to "svd"
        from lrf_tpu.parallel.encode import sharded_qmf_encode_batch
        from lrf_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(data=1, patch=1, devices=jax.devices()[:1])
        default = sharded_qmf_encode_batch(batch, mesh, quality=10)
        explicit = sharded_qmf_encode_batch(batch, mesh, quality=10, init="svd")
        assert default == explicit

    def test_unknown_init_rejected(self, batch):
        from lrf_tpu.parallel.encode import build_sharded_encoder
        from lrf_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(data=1, patch=1, devices=jax.devices()[:1])
        with pytest.raises(AssertionError):
            build_sharded_encoder(
                mesh, (96, 128), quality=10, batch=4, init="typo"
            )


def test_fast_init_all_black_image_no_nan():
    # review finding (round 5): an all-zero channel's Gram made the
    # whitening divide by zero and poisoned the batch with NaNs; the
    # absolute tiny floor must keep factors finite (zero) instead.
    import jax

    from lrf_tpu.models.qmf import qmf_decode
    from lrf_tpu.parallel.encode import sharded_qmf_encode_batch
    from lrf_tpu.parallel.mesh import make_mesh

    batch = np.zeros((2, 3, 48, 64), np.uint8)
    batch[1] = 128  # one black, one flat gray
    mesh = make_mesh(data=1, patch=1, devices=jax.devices()[:1])
    streams = sharded_qmf_encode_batch(batch, mesh, quality=10, init="fast")
    for i, s in enumerate(streams):
        out = qmf_decode(s)
        assert out.shape == batch[i].shape
        # a constant image must reconstruct near-exactly (zero AC energy)
        assert float(np.abs(out.astype(np.int32) - batch[i]).max()) <= 2
