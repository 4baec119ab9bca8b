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

    if n <= m:
        # Gram on the short (column) side: G = X^T X, eigh, U = X V / s.
        g = jnp.einsum("...ij,...ik->...jk", x, x, preferred_element_type=jnp.float32)
        evals, evecs = jnp.linalg.eigh(g)  # ascending
        evals = jnp.flip(evals, axis=-1)[..., :r]
        v = jnp.flip(evecs, axis=-1)[..., :, :r]
        s = jnp.sqrt(jnp.maximum(evals, 0.0))
        safe = jnp.maximum(s, jnp.finfo(x.dtype).tiny ** 0.5)
        u = jnp.einsum("...mn,...nr->...mr", x, v, preferred_element_type=jnp.float32)
        u = u / safe[..., None, :]
        return u, s, v
    else:
        # Gram on the short (row) side: G = X X^T, eigh, V = X^T U / s.
        g = jnp.einsum("...ik,...jk->...ij", x, x, preferred_element_type=jnp.float32)
        evals, evecs = jnp.linalg.eigh(g)
        evals = jnp.flip(evals, axis=-1)[..., :r]
        u = jnp.flip(evecs, axis=-1)[..., :, :r]
        s = jnp.sqrt(jnp.maximum(evals, 0.0))
        safe = jnp.maximum(s, jnp.finfo(x.dtype).tiny ** 0.5)
        v = jnp.einsum("...mn,...mr->...nr", x, u, preferred_element_type=jnp.float32)
        v = v / safe[..., None, :]
        return u, s, v


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
