"""Higher-order SVD (Tucker) and mode products, TPU-first.

Equivalents of `lrf/factorization/hosvd.py` in pashtari/lrf, in pure jnp:
`unfold`, `mode_product` / `multi_mode_product` (einsum contractions — XLA
maps them onto the MXU directly, no opt_einsum needed for these small
orders), `hosvd` (per-mode unfold + truncated left singular vectors + core),
batched variants via `jax.vmap`, and the rank bound / feasible-range helpers
used by the codec's rank search.

Per-mode singular vectors use the same Gram/eigh trick as `lrf_tpu.ops.svd`:
every unfolding here is short x very-long, so eigh of the small Gram matrix
is the fast native TPU path.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from lrf_tpu.ops.common import prod

from lrf_tpu.ops.svd import truncated_svd



def hosvd_rank_upper_bounds(size: Sequence[int]) -> tuple[int, ...]:
    """Per-mode rank upper bounds (`factorization/hosvd.py:11`)."""
    bounds = []
    for i, s in enumerate(size):
        other = prod(s for j, s in enumerate(size) if j != i)
        bounds.append(min(s, other))
    return tuple(bounds)


def hosvd_rank_feasible_ranges(
    size: Sequence[int],
    com_ratio: float,
    rank: Optional[Sequence[Optional[int]]] = None,
):
    """Feasible per-mode rank ranges for a target CR (`factorization/hosvd.py:37`).

    Same estimation scheme as the reference: per mode, a conservative lower
    bound assuming all other ranks maximal, and an optimistic upper bound
    assuming all other ranks 1.
    """
    n = len(size)
    ranks = tuple(rank) if rank is not None else (None,) * n
    assert len(ranks) == n

    upper = [r if r else u for r, u in zip(ranks, hosvd_rank_upper_bounds(size))]
    lower = [r if r else 1 for r in ranks]
    target_storage = prod(size) / com_ratio

    out = []
    for i in range(n):
        if ranks[i]:
            out.append((ranks[i], ranks[i]))
            continue
        storage_max_others = sum(upper[j] * size[j] for j in range(n) if j != i)
        prod_max_others = prod(upper[j] for j in range(n) if j != i)
        lo = max(1, int((target_storage - storage_max_others) / (size[i] + prod_max_others)))
        storage_min_others = sum(lower[j] * size[j] for j in range(n) if j != i)
        prod_min_others = prod(lower[j] for j in range(n) if j != i)
        hi = min(
            upper[i],
            int((target_storage - storage_min_others) / (size[i] + prod_min_others)),
        )
        out.append((lo, hi))
    return out


def unfold(tensor: jnp.ndarray, mode: int) -> jnp.ndarray:
    """Mode-`mode` unfolding (`factorization/hosvd.py:116`)."""
    nd = tensor.ndim
    perm = (mode, *range(mode), *range(mode + 1, nd))
    return tensor.transpose(perm).reshape(tensor.shape[mode], -1)


def mode_product(
    tensor: jnp.ndarray, matrix: jnp.ndarray, mode: int, transpose: bool = False
) -> jnp.ndarray:
    """n-mode product (`factorization/hosvd.py:124`).

    `transpose=False`: contract matrix's *second* index with the mode
    (result dim = matrix rows); `transpose=True`: contract the *first*
    (result dim = matrix cols).
    """
    nd = tensor.ndim
    x = jnp.moveaxis(tensor, mode, -1)
    if transpose:
        out = jnp.einsum("...i,ij->...j", x, matrix)
    else:
        out = jnp.einsum("...i,ji->...j", x, matrix)
    return jnp.moveaxis(out, -1, mode)


def multi_mode_product(
    tensor: jnp.ndarray,
    matrices: Sequence[jnp.ndarray],
    modes: Optional[Sequence[int]] = None,
    transpose: bool = False,
) -> jnp.ndarray:
    """Sequential multi-mode product (`factorization/hosvd.py:135`)."""
    modes = list(range(len(matrices))) if modes is None else list(modes)
    out = tensor
    for matrix, mode in zip(matrices, modes):
        out = mode_product(out, matrix, mode, transpose=transpose)
    return out


def hosvd(x: jnp.ndarray, rank=None):
    """HOSVD: per-mode truncated left singular vectors + core
    (`factorization/hosvd.py:182`). Returns `(core, factors)`.
    """
    nd = x.ndim
    if rank is None or isinstance(rank, int):
        ranks = (rank,) * nd
    else:
        ranks = tuple(rank)
    assert len(ranks) == nd
    factors = []
    for mode in range(nd):
        xm = unfold(x, mode)
        r = ranks[mode] if ranks[mode] is not None else min(xm.shape)
        r = min(r, *xm.shape)
        u, _, _ = truncated_svd(xm, r)
        factors.append(u)
    core = multi_mode_product(x, factors, transpose=True)
    return core, factors


def batched_hosvd(x: jnp.ndarray, rank=None):
    """vmap of `hosvd` over a leading batch dim (`factorization/hosvd.py:198`)."""
    return jax.vmap(partial(hosvd, rank=rank))(x)


def batched_multi_mode_product(
    tensor: jnp.ndarray,
    matrices: Sequence[jnp.ndarray],
    modes: Optional[Sequence[int]] = None,
    transpose: bool = False,
) -> jnp.ndarray:
    """vmap of `multi_mode_product` over leading batch dims of everything."""
    fn = partial(multi_mode_product, modes=modes, transpose=transpose)
    return jax.vmap(fn)(tensor, list(matrices))
