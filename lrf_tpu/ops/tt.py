"""Tensor-Train decomposition, TPU-first.

Equivalents of `lrf/factorization/tt.py` in pashtari/lrf: `ttd` (sequential
reshaped truncated SVDs), `contract_tt` (einsum chain), batched variants, and
the TT rank bound / feasible-range helpers. The per-step SVD uses
`jnp.linalg.svd` (shapes here are small and change every step, so the Gram
trick buys little); ranks are resolved to static values on the host, keeping
every step jit-compatible.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from lrf_tpu.ops.common import prod



def tt_rank_upper_bounds(size: Sequence[int]) -> list[int]:
    """Rank bounds between consecutive modes (`factorization/tt.py:11`)."""
    nd = len(size)
    bounds = []
    for i in range(1, nd):
        left = prod(size[:i])
        right = prod(size[i:])
        bounds.append(min(left, right))
    return bounds


def tt_rank_feasible_ranges(size: Sequence[int], com_ratio: float):
    """Feasible TT-rank ranges for a target CR (`factorization/tt.py:44`)."""
    upper = [1, *tt_rank_upper_bounds(size), 1]
    target_storage = prod(size) / com_ratio
    out = []
    for i in range(1, len(upper) - 1):
        storage_max_others = sum(
            upper[j] * size[j] * upper[j + 1]
            for j in range(len(size))
            if j not in (i - 1, i)
        )
        lo = max(
            1,
            int(
                (target_storage - storage_max_others)
                / (upper[i - 1] * size[i - 1] + upper[i + 1] * size[i])
            ),
        )
        storage_min_others = sum(
            size[j - 1] for j in range(1, len(upper)) if j not in (i, i + 1)
        )
        hi = min(
            upper[i],
            int((target_storage - storage_min_others) / (size[i - 1] + size[i])),
        )
        out.append((lo, hi))
    return out


def ttd(x: jnp.ndarray, rank: Optional[Sequence[Optional[int]] | int] = None):
    """Tensor-Train decomposition (`factorization/tt.py:114`).

    Returns `x.ndim` factors; first is `(n0, r1)`, middle are
    `(r_k, n_k, r_{k+1})`, last is `(r_{d-1}, n_{d-1})`.
    """
    nd = x.ndim
    if rank is None or isinstance(rank, int):
        ranks = [rank] * (nd - 1)
    else:
        ranks = list(rank)
    assert len(ranks) == nd - 1
    ranks = [float("inf") if r is None else r for r in ranks]
    ranks = [1, *ranks, 1]

    unfolding = x
    factors: list = [None] * nd
    for k in range(nd - 1):
        num_rows = int(ranks[k] * x.shape[k])
        unfolding = unfolding.reshape(num_rows, -1)
        m, n = unfolding.shape
        current_rank = int(min(m, n, ranks[k + 1]))
        u, s, vt = jnp.linalg.svd(unfolding, full_matrices=False)
        u = u[..., :current_rank]
        s = s[..., :current_rank]
        vt = vt[..., :current_rank, :]
        ranks[k + 1] = current_rank
        factors[k] = u.reshape(int(ranks[k]), x.shape[k], current_rank)
        unfolding = s[:, None] * vt
    factors[-1] = unfolding
    factors[0] = factors[0][0]  # drop the leading rank-1 dim
    return factors


def batched_ttd(x: jnp.ndarray, rank=None):
    """vmap of `ttd` over a leading batch dim (`factorization/tt.py:154`)."""
    return jax.vmap(lambda t: ttd(t, rank=rank))(x)


def contract_tt(factors: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Reconstruct from TT factors by chain contraction (`factorization/tt.py:157`)."""
    out = factors[0]  # (n0, r1)
    for f in factors[1:-1]:  # (r, n, r')
        out = jnp.tensordot(out, f, axes=([-1], [0]))
    out = jnp.tensordot(out, factors[-1], axes=([-1], [0]))
    return out


def batched_contract_tt(factors: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """vmap of `contract_tt` over leading batch dims (`factorization/tt.py:176`)."""
    return jax.vmap(contract_tt)(list(factors))
