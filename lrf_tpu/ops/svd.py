"""Truncated SVD for tall-skinny patch matrices, TPU-first.

The reference uses `torch.linalg.svd` for both the SVD codec and the QMF
initializer (`lrf/factorization/qmf.py:44`, `lrf/compression/svd.py:179` in
pashtari/lrf). On TPU, a direct SVD lowers to an iterative QDWH algorithm that
is slow for our shapes; but every matrix here is extremely tall-skinny
(num_patches x 64), so we instead form the Gram matrix on the short side
(64x64, one MXU GEMM), eigendecompose it with `eigh` (fast native TPU path),
and recover the long-side factor with another GEMM. Accuracy of the tail
singular vectors is lower than a true SVD, but downstream the factors are
integer-projected and refined by 10 BCD sweeps, which erases the difference
(validated in tests against `jnp.linalg.svd`).

`method="svd"` falls back to `jnp.linalg.svd` for exact behavior.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _gram_eig(g, method: str):
    """Ascending eigendecomposition of a batched Gram: XLA's `eigh`
    ("gram", the default) or the batched-GEMM parallel Jacobi ("jacobi",
    `lrf_tpu.ops.jacobi`). The Jacobi route was measured and NOT adopted:
    standalone it beats XLA's eigh 1.5x at B=192, but inside the fused
    encode program it runs slower (XLA schedules eigh better in context)
    and its f32 tail eigenvectors degrade high-rank quality (-1.3 dB at
    q40); kept as a documented alternative for small-rank batch work."""
    if method == "jacobi":
        from lrf_tpu.ops.jacobi import jacobi_eigh

        return jacobi_eigh(g)
    return jnp.linalg.eigh(g)


def _factors_from_gram_eigh(x, evals, evecs, r: int):
    """Truncated `(u, s, v)` of `x` from the eigendecomposition of its
    column Gram `X^T X` (eigh returns ascending order)."""
    evals = jnp.flip(evals, axis=-1)[..., :r]
    v = jnp.flip(evecs, axis=-1)[..., :, :r]
    s = jnp.sqrt(jnp.maximum(evals, 0.0))
    safe = jnp.maximum(s, jnp.finfo(x.dtype).tiny ** 0.5)
    u = jnp.einsum("...mn,...nr->...mr", x, v, preferred_element_type=jnp.float32)
    u = u / safe[..., None, :]
    return u, s, v


@partial(jax.jit, static_argnames=("rank", "method"))
def truncated_svd(x: jnp.ndarray, rank: int, method: str = "gram"):
    """Top-`rank` singular triplets of `(..., M, N)`, descending order.

    Returns `(u, s, v)` with `u: (..., M, R)`, `s: (..., R)`, `v: (..., N, R)`
    (note: `v` holds right singular *vectors as columns*, i.e. torch's `Vh.T`).
    `rank` must be <= min(M, N).
    """
    m, n = x.shape[-2], x.shape[-1]
    r = min(rank, m, n)
    if method == "svd":
        u, s, vh = jnp.linalg.svd(x, full_matrices=False)
        return u[..., :, :r], s[..., :r], jnp.swapaxes(vh, -1, -2)[..., :, :r]
    if method == "randomized":
        if n <= m:
            return randomized_truncated_svd(x, r)
        method = "gram"  # wide matrices: the sketch saves nothing; exact path

    if n <= m:
        # Gram on the short (column) side: G = X^T X, eig, U = X V / s.
        g = jnp.einsum("...ij,...ik->...jk", x, x, preferred_element_type=jnp.float32)
        evals, evecs = _gram_eig(g, method)  # ascending
        return _factors_from_gram_eigh(x, evals, evecs, r)
    else:
        # Gram on the short (row) side: G = X X^T, eig, V = X^T U / s.
        g = jnp.einsum("...ik,...jk->...ij", x, x, preferred_element_type=jnp.float32)
        evals, evecs = _gram_eig(g, method)
        evals = jnp.flip(evals, axis=-1)[..., :r]
        u = jnp.flip(evecs, axis=-1)[..., :, :r]
        s = jnp.sqrt(jnp.maximum(evals, 0.0))
        safe = jnp.maximum(s, jnp.finfo(x.dtype).tiny ** 0.5)
        v = jnp.einsum("...mn,...mr->...nr", x, u, preferred_element_type=jnp.float32)
        v = v / safe[..., None, :]
        return u, s, v


def shared_truncated_svd(stacks, ranks, method: str = "gram"):
    """Truncated SVDs of several same-N patch stacks via ONE batched eigh.

    `stacks`: sequence of `(B_i, M_i, N)` arrays (M_i may differ; N — the
    patch-vector length — must match). Their column Grams are all `(N, N)`,
    so the QMF encoder's per-channel inits can share one `eigh` over the
    concatenated Gram batch. Measured on the v5e the TPU `eigh` cost is
    batch-LINEAR (~0.2 ms per 64x64 matrix: 14.7/26.5/38.4 ms at
    B=64/128/192), so the merge saves only the per-op overhead — kept
    because it is free and structurally simpler (one init for the whole
    program). Per-matrix results are identical to separate calls (the
    batched Jacobi sweep schedule is fixed, not data-dependent; pinned by
    tests and byte-identical encode streams).

    Returns a list of `(u, s, v)` like `truncated_svd(..., method="gram")`.
    """
    n = stacks[0].shape[-1]
    assert all(x.shape[-1] == n for x in stacks)
    grams = [
        jnp.einsum(
            "...ij,...ik->...jk", x, x, preferred_element_type=jnp.float32
        ).reshape(-1, n, n)
        for x in stacks
    ]
    sizes = [g.shape[0] for g in grams]
    evals, evecs = _gram_eig(jnp.concatenate(grams, axis=0), method)
    out = []
    offset = 0
    for x, rank, size in zip(stacks, ranks, sizes):
        m = x.shape[-2]
        r = min(rank, m, n)
        ev = evals[offset : offset + size].reshape(x.shape[:-2] + (n,))
        eV = evecs[offset : offset + size].reshape(x.shape[:-2] + (n, n))
        out.append(_factors_from_gram_eigh(x, ev, eV, r))
        offset += size
    return out


def svd_balanced_factors(
    x: jnp.ndarray, rank: int, method: str = "gram"
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """sqrt(s)-balanced truncated-SVD factors: `x ~ u @ v.T`.

    Matches the reference split `u = U sqrt(S)`, `v = V sqrt(S)`
    (`lrf/factorization/qmf.py:44-48`, `lrf/compression/svd.py:182-183`).
    If `rank > min(M, N)` the factors are zero-padded on the rank axis,
    like the reference initializer (`lrf/factorization/qmf.py:50-52`).
    """
    m, n = x.shape[-2], x.shape[-1]
    r_eff = min(rank, m, n)
    u, s, v = truncated_svd(x, r_eff, method=method)
    rs = jnp.sqrt(s)
    u = u * rs[..., None, :]
    v = v * rs[..., None, :]
    if rank > r_eff:
        pad = [(0, 0)] * (u.ndim - 1) + [(0, rank - r_eff)]
        u = jnp.pad(u, pad)
        v = jnp.pad(v, pad)
    return u, v


def randomized_truncated_svd(
    x: jnp.ndarray, rank: int, oversample: int = 10, seed: int = 0
):
    """Top-`rank` triplets via a randomized Gram range-finder — the opt-in
    throughput init (round-5 eigh-floor work; `experiments/roofline.json`
    `eigh_floor` section has the measured attempt matrix).

    The encode program's device time is dominated by the batched N=64 Gram
    `eigh` (~0.18 ms/matrix, batch-linear), but the init only needs the
    top-R eigenpairs. This projects the Gram onto a K = rank + oversample
    dimensional sketch (one fixed, seeded Gaussian test matrix — fully
    deterministic and batch-invariant), orthonormalizes the sketch with two
    regularized-whitening passes (a single f32 pass loses orthogonality at
    the Gram's ~1e6 condition — the round-4 subspace-iteration collapse),
    and Rayleigh-Ritz extracts the leading pairs from a K x K eigh
    (~0.05 ms/matrix at K=16 vs 0.18 at N=64).

    ACCURACY (measured, kodim-derived stacks, after 10 BCD sweeps +
    projection): low rank only. q=10 (r=6): dPSNR mean -0.04 dB, worst
    -0.13; q=25 (r=16): ~-0.5 dB; q=40 (r=26): ~-1.9 dB. The tail Ritz
    vectors are f32-orthonormalization-limited (even a FULL K=N sketch
    loses ~3 dB at q40 through the whitening), so this is NOT the default:
    the byte contracts pin the exact-eigh path; use via `init="fast"` for
    throughput encoding at quality <~12.

    Power iterations are deliberately absent: G is already X^T X, so one
    power step works with sigma(X)^4 and collapses in f32 (measured:
    captured spectral mass 0.02-0.78 with a power step vs 0.999 without).
    """
    m, n = x.shape[-2], x.shape[-1]
    assert n <= m, "randomized init expects tall patch stacks (M >= N)"
    r = min(rank, m, n)
    k = min(n, r + oversample)
    g = jnp.einsum("...ij,...ik->...jk", x, x, preferred_element_type=jnp.float32)
    om = jnp.asarray(
        np.random.default_rng(seed).standard_normal((n, k)), jnp.float32
    )
    y = g @ om
    y = y / jnp.maximum(jnp.linalg.norm(y, axis=-2, keepdims=True), 1e-30)
    for _ in range(2):  # regularized whitening, twice (CGS2-style)
        s_small = jnp.einsum("...nk,...nl->...kl", y, y)
        se, sw = jnp.linalg.eigh(s_small)
        # relative clamp (whitening regularization) + absolute tiny floor:
        # an all-zero stack (e.g. a black image's channel) has se == 0
        # everywhere, and a purely relative clamp would divide by zero and
        # poison the whole batch with NaNs (y is 0 there, so any finite
        # inverse yields the correct zero factors)
        floor = jnp.maximum(
            1e-6 * se[..., -1:], jnp.finfo(x.dtype).tiny ** 0.5
        )
        y = y @ (sw / jnp.sqrt(jnp.maximum(se, floor))[..., None, :])
    b_small = jnp.einsum("...nk,...nm,...ml->...kl", y, g, y)
    lam, w = jnp.linalg.eigh(b_small)
    lam = jnp.flip(lam, axis=-1)[..., :r]
    w = jnp.flip(w, axis=-1)[..., :, :r]
    v = y @ w
    s = jnp.sqrt(jnp.maximum(lam, 0.0))
    safe = jnp.maximum(s, jnp.finfo(x.dtype).tiny ** 0.5)
    u = jnp.einsum("...mn,...nr->...mr", x, v, preferred_element_type=jnp.float32)
    return u / safe[..., None, :], s, v
