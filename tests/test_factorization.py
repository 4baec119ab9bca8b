"""Tests for the factorization layer: truncated SVD, BCD solver, QMF.

Includes cross-checks against the reference torch implementation
(`lrf/factorization/qmf.py`) run from identical starting factors, so the
Gauss-Seidel sweep semantics are verified column-for-column independently of
SVD initialization differences.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from lrf_tpu.ops.bcd import (
    bcd_sweep,
    make_project,
    qmf_decompose,
    qmf_loss,
    qmf_reconstruct,
    svd_init,
    update_w,
)
from lrf_tpu.ops.svd import svd_balanced_factors, truncated_svd

RNG = np.random.default_rng(42)


class TestTruncatedSVD:
    @pytest.mark.parametrize("shape", [(200, 64), (64, 200), (50, 50)])
    @pytest.mark.parametrize("method", ["gram", "svd"])
    def test_reconstruction(self, shape, method):
        # Low-rank + noise matrix; top-r SVD should capture the signal.
        r = 8
        a = RNG.standard_normal((shape[0], r)).astype(np.float32)
        b = RNG.standard_normal((r, shape[1])).astype(np.float32)
        x = jnp.asarray(a @ b)
        u, s, v = truncated_svd(x, r, method=method)
        recon = (u * s[None, :]) @ v.T
        err = np.linalg.norm(np.asarray(recon) - np.asarray(x)) / np.linalg.norm(
            np.asarray(x)
        )
        assert err < 1e-3

    def test_gram_matches_svd_singular_values(self):
        x = jnp.asarray(RNG.standard_normal((300, 64)).astype(np.float32))
        _, s1, _ = truncated_svd(x, 10, method="gram")
        _, s2, _ = truncated_svd(x, 10, method="svd")
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-3)

    def test_balanced_factors_pad(self):
        x = jnp.asarray(RNG.standard_normal((20, 10)).astype(np.float32))
        u, v = svd_balanced_factors(x, 15)
        assert u.shape == (20, 15) and v.shape == (10, 15)
        assert np.all(np.asarray(u[:, 10:]) == 0)

    def test_batched(self):
        x = jnp.asarray(RNG.standard_normal((4, 100, 32)).astype(np.float32))
        u, s, v = truncated_svd(x, 5)
        assert u.shape == (4, 100, 5) and s.shape == (4, 5) and v.shape == (4, 32, 5)


def _ref_qmf(rank, num_iters, bounds):
    import sys

    sys.path.insert(0, "/root/reference")
    from lrf.factorization.qmf import QMF

    return QMF(rank=rank, num_iters=num_iters, bounds=bounds, factor=(0, 1))


class TestBCDvsReference:
    """One sweep from identical factors must match the torch solver exactly."""

    @pytest.mark.parametrize("rank", [1, 4, 13])
    def test_sweep_matches_reference(self, ref_lrf, rank):
        import torch

        m, n = 120, 64
        x = RNG.integers(0, 256, (m, n)).astype(np.float32)
        u0 = RNG.integers(-16, 16, (m, rank)).astype(np.float32)
        v0 = RNG.integers(-16, 16, (n, rank)).astype(np.float32)
        w0 = np.concatenate(
            [np.zeros((1, 1), np.float32), np.ones((1, 1), np.float32)], axis=0
        )

        solver = _ref_qmf(rank, 1, (-16, 15)).solver
        tu, tv, tw = solver(
            torch.tensor(x), [torch.tensor(u0), torch.tensor(v0), torch.tensor(w0)]
        )

        project = make_project((-16, 15))
        ju, jv, _ = bcd_sweep(
            jnp.asarray(x),
            jnp.asarray(u0),
            jnp.asarray(v0),
            jnp.asarray(w0),
            factor=(0, 1),
            project=project,
        )
        np.testing.assert_array_equal(np.asarray(ju), tu.numpy())
        np.testing.assert_array_equal(np.asarray(jv), tv.numpy())

    def test_multi_sweep_matches_reference(self, ref_lrf):
        import torch

        rank, iters = 6, 10
        m, n = 96, 64
        x = RNG.integers(0, 256, (m, n)).astype(np.float32)
        u0 = RNG.integers(-16, 16, (m, rank)).astype(np.float32)
        v0 = RNG.integers(-16, 16, (n, rank)).astype(np.float32)
        w0 = np.concatenate(
            [np.zeros((1, 1), np.float32), np.ones((1, 1), np.float32)], axis=0
        )
        solver = _ref_qmf(rank, iters, (-16, 15)).solver
        tu, tv, tw = torch.tensor(u0), torch.tensor(v0), torch.tensor(w0)
        for _ in range(iters):
            tu, tv, tw = solver(torch.tensor(x), [tu, tv, tw])

        project = make_project((-16, 15))
        ju, jv, jw = jnp.asarray(u0), jnp.asarray(v0), jnp.asarray(w0)
        for _ in range(iters):
            ju, jv, jw = bcd_sweep(
                jnp.asarray(x), ju, jv, jw, factor=(0, 1), project=project
            )
        np.testing.assert_array_equal(np.asarray(ju), tu.numpy())
        np.testing.assert_array_equal(np.asarray(jv), tv.numpy())


class TestQMF:
    def test_loss_monotone(self):
        # BCD loss is non-increasing per sweep (paper method.tex:138-146).
        x = jnp.asarray(RNG.integers(0, 256, (200, 64)).astype(np.float32))
        losses = []
        for iters in [0, 1, 2, 5, 10]:
            u, v, w = qmf_decompose(x, rank=8, num_iters=iters, bounds=(-16, 15))
            losses.append(float(qmf_loss(x, u, v)))
        # iters=0 is the *float* SVD init (no projection) so it is excluded;
        # from the first projected sweep onward the loss is non-increasing.
        assert losses[2] <= losses[1] + 1e-6
        assert losses[3] <= losses[2] + 1e-6
        assert losses[4] <= losses[3] + 1e-6

    def test_factors_within_bounds(self):
        x = jnp.asarray(RNG.integers(0, 256, (128, 64)).astype(np.float32))
        u, v, _ = qmf_decompose(x, rank=5, num_iters=3, bounds=(-16, 15))
        for f in (u, v):
            arr = np.asarray(f)
            assert np.all(arr == np.round(arr))
            assert arr.min() >= -16 and arr.max() <= 15

    def test_init_sign_uses_asymmetric_bound_range(self):
        # The bounds (-16, 15) are asymmetric: for a bright all-positive
        # matrix, the negative orientation of a rank-1 component reaches
        # (-16)*(-16) = 256 while the positive caps at 15*15 = 225 and
        # clips every value above it (~3 dB on real photographs). svd_init
        # must pick the orientation that clips less, regardless of the
        # arbitrary SVD sign convention.
        from lrf_tpu.ops.bcd import svd_init

        x = jnp.asarray(
            np.full((256, 64), 240.0, np.float32)
            + RNG.normal(0, 4, (256, 64)).astype(np.float32)
        )
        u0, v0, _ = svd_init(x, 1, bounds=(-16, 15))
        assert float(u0.mean()) < 0 and float(v0.mean()) < 0
        u, v, _ = qmf_decompose(x, rank=1, num_iters=5, bounds=(-16, 15))
        rec = np.asarray(u) @ np.asarray(v).T
        # 240 is representable only via the negative orientation
        assert abs(rec.mean() - 240) < 8, rec.mean()

    def test_batched_matches_single(self):
        xs = RNG.integers(0, 256, (3, 100, 64)).astype(np.float32)
        ub, vb, _ = qmf_decompose(jnp.asarray(xs), rank=4, num_iters=3, bounds=(-16, 15))
        u1, v1, _ = qmf_decompose(jnp.asarray(xs[1]), rank=4, num_iters=3, bounds=(-16, 15))
        np.testing.assert_array_equal(np.asarray(ub[1]), np.asarray(u1))
        np.testing.assert_array_equal(np.asarray(vb[1]), np.asarray(v1))

    def test_update_w_matches_lstsq(self):
        x = jnp.asarray(RNG.standard_normal((40, 30)).astype(np.float32))
        u = jnp.asarray(RNG.standard_normal((40, 3)).astype(np.float32))
        v = jnp.asarray(RNG.standard_normal((30, 3)).astype(np.float32))
        w = update_w(x, u, v)
        z = np.asarray(u @ v.T).ravel()
        a = np.stack([np.ones_like(z), z], axis=1)
        sol, *_ = np.linalg.lstsq(a, np.asarray(x).ravel(), rcond=None)
        np.testing.assert_allclose(np.asarray(w).ravel(), sol, rtol=1e-3, atol=1e-4)

    def test_reconstruct_with_w(self):
        u = jnp.asarray(RNG.standard_normal((10, 2)).astype(np.float32))
        v = jnp.asarray(RNG.standard_normal((8, 2)).astype(np.float32))
        w = jnp.asarray(np.array([[2.0], [3.0]], np.float32))
        out = qmf_reconstruct(u, v, w)
        expected = 2.0 + 3.0 * np.asarray(u) @ np.asarray(v).T
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5, atol=1e-5)

    def test_svd_init_num_levels(self):
        x = jnp.asarray(RNG.standard_normal((50, 20)).astype(np.float32))
        u, v, w = svd_init(x, 4, num_levels=32)
        # compensating scale folded into w1: reconstruction unchanged
        recon_scaled = np.asarray(qmf_reconstruct(u, v, w))
        u0, v0, w0 = svd_init(x, 4)
        recon_plain = np.asarray(qmf_reconstruct(u0, v0, w0))
        np.testing.assert_allclose(recon_scaled, recon_plain, rtol=1e-3, atol=1e-4)


    def test_svd_init_shared_matches_per_stack(self):
        # The encoder's shared-eigh init (one batched eigh over all
        # channels' (N, N) Grams) must reproduce per-stack svd_init
        # exactly — same math, same batched-eigh rotation schedule.
        from lrf_tpu.ops.bcd import svd_init_shared

        y = jnp.asarray(RNG.integers(0, 256, (4, 300, 64)).astype(np.float32))
        c = jnp.asarray(RNG.integers(0, 256, (8, 90, 64)).astype(np.float32))
        shared = svd_init_shared([y, c], [6, 3], bounds=(-16, 15))
        for stack, rank, (u, v, w) in zip([y, c], [6, 3], shared):
            u0, v0, w0 = svd_init(stack, rank, bounds=(-16, 15))
            np.testing.assert_array_equal(np.asarray(u), np.asarray(u0))
            np.testing.assert_array_equal(np.asarray(v), np.asarray(v0))
            np.testing.assert_array_equal(np.asarray(w), np.asarray(w0))

    def test_jacobi_eigh_matches_xla_eigh(self):
        # The batched-GEMM parallel Jacobi (ops/jacobi.py) must satisfy the
        # eigh contract on PSD Grams: ascending eigenvalues matching XLA's,
        # orthonormal eigenvectors, small residual.
        from lrf_tpu.ops.jacobi import jacobi_eigh

        x = jnp.asarray(RNG.standard_normal((6, 64, 64)).astype(np.float32))
        g = jnp.einsum("bij,bik->bjk", x, x)
        ev, V = jacobi_eigh(g, sweeps=8)
        e0, _ = jnp.linalg.eigh(g)
        scale = float(jnp.abs(e0).max())
        assert float(jnp.abs(ev - e0).max()) < 1e-4 * scale
        orth = jnp.einsum("bij,bik->bjk", V, V) - jnp.eye(64)
        assert float(jnp.abs(orth).max()) < 1e-3
        resid = jnp.einsum("bij,bjk->bik", g, V) - V * ev[:, None, :]
        assert float(jnp.linalg.norm(resid, axis=(1, 2)).max()) < 1e-4 * scale

    def test_jacobi_eigh_equal_diagonal_pairs(self):
        # Regression: jnp.sign(0) = 0 used to zero the rotation exactly
        # when a pivot pair's diagonal entries are equal (tau = 0), where
        # the classic formula needs the full 45-degree rotation — equal-
        # diagonal 2x2 blocks were never annihilated.
        from lrf_tpu.ops.jacobi import jacobi_eigh

        g = jnp.asarray([[[1.0, 0.5], [0.5, 1.0]]], jnp.float32)
        ev, V = jacobi_eigh(g, sweeps=4)
        np.testing.assert_allclose(np.asarray(ev)[0], [0.5, 1.5], atol=1e-6)
        g4 = jnp.asarray(
            [[[2.0, 0.7, 0.0, 0.0], [0.7, 2.0, 0.0, 0.0],
              [0.0, 0.0, 2.0, 0.3], [0.0, 0.0, 0.3, 2.0]]], jnp.float32
        )
        ev4, _ = jacobi_eigh(g4, sweeps=6)
        np.testing.assert_allclose(
            np.asarray(ev4)[0], [1.3, 1.7, 2.3, 2.7], atol=1e-5
        )
