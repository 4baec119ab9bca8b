"""Class-based API surface tests (reference `nn.Module` parity layer)."""

import numpy as np
import jax.numpy as jnp

from lrf_tpu.ops.modules import HOSVD, QMF, CoordinateDescent, RandInit, SVDInit
from lrf_tpu.ops.bcd import qmf_decompose

RNG = np.random.default_rng(31)


class TestQMFClass:
    def test_decompose_matches_functional(self):
        x = jnp.asarray(RNG.integers(0, 256, (120, 64)).astype(np.float32))
        qmf = QMF(rank=5, num_iters=4, bounds=(-16, 15), factor=(0, 1))
        u1, v1, w1 = qmf.decompose(x)
        u2, v2, w2 = qmf_decompose(x, rank=5, num_iters=4, bounds=(-16, 15), factor=(0, 1))
        np.testing.assert_array_equal(np.asarray(u1), np.asarray(u2))
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))

    def test_decompose_matches_functional_when_sign_selection_fires(self):
        # Bright image-like data whose leading component CLIPS under the
        # integer bounds: the clip-minimizing sign selection in svd_init
        # actually changes the factors here, so this pins that the class
        # API routes `bounds` into its initializer exactly like the
        # functional path (round-2 divergence: QMF built SVDInit without
        # bounds and silently skipped the selection).
        x = jnp.asarray(
            (200.0 + RNG.standard_normal((512, 64)) * 20).astype(np.float32)
        )
        qmf = QMF(rank=3, num_iters=4, bounds=(-16, 15), factor=(0, 1))
        u1, v1, _ = qmf.decompose(x)
        u2, v2, _ = qmf_decompose(
            x, rank=3, num_iters=4, bounds=(-16, 15), factor=(0, 1)
        )
        np.testing.assert_array_equal(np.asarray(u1), np.asarray(u2))
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
        # the selection really fired: leading component is negative-oriented
        # (asymmetric bounds reach further on the negative side)
        assert float(np.asarray(u1)[:, 0].sum()) < 0

    def test_forward_roundtrip(self):
        x = jnp.asarray(RNG.integers(0, 256, (64, 64)).astype(np.float32))
        recon = QMF(rank=8, num_iters=3, bounds=(-16, 15), factor=(0, 1))(x)
        assert recon.shape == x.shape

    def test_w_update_path(self):
        # factor=(0,1,2) exercises the affine refit like the reference default
        x = jnp.asarray(RNG.integers(0, 256, (80, 40)).astype(np.float32))
        u, v, w = QMF(rank=4, num_iters=3, bounds=(-16, 15), factor=(0, 1, 2)).decompose(x)
        assert w.shape[-2:] == (2, 1)
        assert not np.allclose(np.asarray(w)[..., 1, 0], 1.0)  # w1 actually refit

    def test_regularization_path_runs(self):
        x = jnp.asarray(RNG.integers(0, 256, (80, 40)).astype(np.float32))
        u, v, _ = QMF(rank=4, num_iters=2, bounds=(-16, 15), factor=(0, 1), l2=1e-4, l1_ratio=0.5).decompose(x)
        assert np.asarray(u).shape == (80, 4)


class TestInitializers:
    def test_svd_init(self):
        x = jnp.asarray(RNG.standard_normal((50, 30)).astype(np.float32))
        u, v, w = SVDInit(rank=6)(x)
        assert u.shape == (50, 6) and v.shape == (30, 6) and w.shape == (2, 1)

    def test_rand_init_bounds(self):
        x = jnp.asarray(RNG.standard_normal((20, 10)).astype(np.float32))
        u, v = RandInit(rank=3, bounds=(-16, 15))(x)
        assert u.shape == (20, 3) and v.shape == (10, 3)
        assert np.asarray(u).min() >= -16 and np.asarray(u).max() <= 15


class TestCoordinateDescent:
    def test_identity_project_default(self):
        x = jnp.asarray(RNG.standard_normal((30, 20)).astype(np.float32))
        u = jnp.asarray(RNG.standard_normal((30, 2)).astype(np.float32))
        v = jnp.asarray(RNG.standard_normal((20, 2)).astype(np.float32))
        w = jnp.asarray(np.array([[0.0], [1.0]], np.float32))
        solver = CoordinateDescent(factor=(0, 1))
        u2, v2, _ = solver(x, (u, v, w))
        # no projection: factors are generally non-integer
        assert not np.all(np.asarray(u2) == np.round(np.asarray(u2)))


class TestHOSVDClass:
    def test_roundtrip(self):
        x = jnp.asarray(RNG.standard_normal((5, 6, 7)).astype(np.float32))
        recon = HOSVD()(x)
        np.testing.assert_allclose(np.asarray(recon), np.asarray(x), atol=1e-3)
