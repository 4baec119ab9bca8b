"""Batched symmetric eigendecomposition via parallel cyclic Jacobi, TPU-first.

Motivation (measured, v5e): `jnp.linalg.eigh` on `(B, 64, 64)` costs
~0.2 ms PER MATRIX (batch-linear: 14.7/26.5/38.4 ms at B=64/128/192) — the
single largest term in the QMF encode program's device time
(`experiments/roofline.json`). XLA's lowering is a serial iterative
algorithm whose per-matrix schedule does not amortize over the batch.

OUTCOME (measured, recorded for the roofline's attribution): standalone
this wins 1.5x at B=192 (25.8 vs 38.2 ms), but inside the fused encode
program it measures SLOWER than XLA's eigh (39.7 vs 28.6 ms/batch64 at
q10), and its f32 accuracy on trailing eigenvectors costs -0.2 dB at
q10 and -1.3 dB at q40. It is therefore NOT the codec default ("gram"
uses XLA's eigh); it remains available as `method="jacobi"` for
small-rank batched eigenproblems where the leading subspace is all that
matters.

This module implements the classic round-robin ("circle method") parallel
Jacobi instead: each of the `N-1` rounds rotates `N/2` DISJOINT pivot pairs
simultaneously, so a whole round is ONE batched orthogonal update
`G <- R^T G R`, `V <- V R` built from static-index scatters and batched
MXU GEMMs — no per-element control flow, no data-dependent schedule, fully
parallel over the batch. `sweeps` full passes (default 10) drive the
off-diagonal norm to f32 roundoff for 64x64 PSD Grams (quadratic terminal
convergence; accuracy pinned against `jnp.linalg.eigh` in tests).

The rotation schedule is FIXED (independent of the data), so results are
deterministic and batch-invariant — encoding one image alone or in a batch
produces identical factors, preserving the codec's byte-determinism
contract.

Returns ascending eigenvalues like `jnp.linalg.eigh` (the caller-facing
contract of `lrf_tpu.ops.svd.truncated_svd`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _round_robin_pairs(n: int) -> list[tuple[np.ndarray, np.ndarray]]:
    """The circle-method schedule: n-1 rounds of n/2 disjoint (p, q) pairs
    covering every unordered pair exactly once per sweep."""
    assert n % 2 == 0
    players = list(range(n))
    rounds = []
    for _ in range(n - 1):
        ps, qs = [], []
        for i in range(n // 2):
            a, b = players[i], players[n - 1 - i]
            ps.append(min(a, b))
            qs.append(max(a, b))
        rounds.append((np.asarray(ps), np.asarray(qs)))
        # rotate all but the first
        players = [players[0]] + [players[-1]] + players[1:-1]
    return rounds


@partial(jax.jit, static_argnames=("sweeps",))
def jacobi_eigh(g: jnp.ndarray, sweeps: int = 10):
    """Eigendecomposition of symmetric `(..., N, N)` (ascending order).

    Drop-in for `jnp.linalg.eigh` on small batched matrices (N even,
    intended N<=128). See module docstring for the TPU rationale.
    """
    n = g.shape[-1]
    batch_shape = g.shape[:-2]
    g = g.reshape((-1, n, n)).astype(jnp.float32)
    rounds = _round_robin_pairs(n)
    eye = jnp.eye(n, dtype=jnp.float32)

    def one_round(g, v, ps, qs):
        app = g[:, ps, ps]  # (B, n/2)
        aqq = g[:, qs, qs]
        apq = g[:, ps, qs]
        # classic stable rotation: t = sign(tau)/(|tau| + sqrt(1+tau^2))
        small = jnp.abs(apq) <= 1e-30 * jnp.maximum(
            jnp.abs(app) + jnp.abs(aqq), 1e-30
        )
        tau = (aqq - app) / jnp.where(small, 1.0, 2.0 * apq)
        # sign(tau) with sign(0) := +1 — jnp.sign(0) = 0 would zero the
        # rotation exactly when app == aqq, where the classic formula
        # needs the full 45-degree rotation (equal-diagonal pairs would
        # otherwise never be annihilated; verified failure on
        # [[1, .5], [.5, 1]])
        sgn = jnp.where(tau >= 0, 1.0, -1.0)
        t = sgn / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        t = jnp.where(small, 0.0, t)
        c = 1.0 / jnp.sqrt(1.0 + t * t)  # (B, n/2)
        s = t * c
        # R = identity with (c, s) plane rotations on the disjoint pairs.
        # Applying R^T G R via batched MXU GEMMs measures FASTER than the
        # row/column gather-scatter formulation on TPU (25.8 vs 47 ms at
        # B=192: arbitrary-index scatters lower poorly, dense GEMMs ride
        # the MXU).
        r = jnp.broadcast_to(eye, g.shape)
        r = r.at[:, ps, ps].set(c)
        r = r.at[:, qs, qs].set(c)
        r = r.at[:, ps, qs].set(s)
        r = r.at[:, qs, ps].set(-s)
        rg = jnp.einsum(
            "bij,bik->bjk", r, g, preferred_element_type=jnp.float32
        )  # R^T G
        g = jnp.einsum(
            "bij,bjk->bik", rg, r, preferred_element_type=jnp.float32
        )
        g = 0.5 * (g + jnp.swapaxes(g, -1, -2))  # exact symmetry
        v = jnp.einsum("bij,bjk->bik", v, r, preferred_element_type=jnp.float32)
        return g, v

    def one_sweep(_, gv):
        g, v = gv
        for ps, qs in rounds:  # static schedule: unrolled, static scatters
            g, v = one_round(g, v, jnp.asarray(ps), jnp.asarray(qs))
        return g, v

    v0 = jnp.broadcast_to(eye, g.shape)
    g, v = jax.lax.fori_loop(0, sweeps, one_sweep, (g, v0))

    evals = jnp.diagonal(g, axis1=-2, axis2=-1)
    order = jnp.argsort(evals, axis=-1)  # ascending, eigh contract
    evals = jnp.take_along_axis(evals, order, axis=-1)
    v = jnp.take_along_axis(v, order[:, None, :], axis=-1)
    return (
        evals.reshape(batch_shape + (n,)),
        v.reshape(batch_shape + (n, n)),
    )
