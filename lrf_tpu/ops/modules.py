"""Class-based factorization API mirroring the reference's module surface.

The reference exposes `QMF`, `CoordinateDescent`, `SVDInit`, `RandInit`
(`lrf/factorization/qmf.py` in pashtari/lrf) and `HOSVD`
(`lrf/factorization/hosvd.py:201`) as torch `nn.Module`s. These are thin
stateless wrappers over the functional jnp kernels in `lrf_tpu.ops` with the
same constructor parameters and `decompose`/`reconstruct`/`__call__`
contracts, so reference-style user code ports one import away.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from lrf_tpu.ops.bcd import (
    bcd_sweep,
    make_project,
    qmf_loss,
    qmf_reconstruct,
    svd_init,
    update_w,
)
# note: the package attribute `lrf_tpu.ops.hosvd` is shadowed by the
# function re-export in ops/__init__, so import the functions directly
from lrf_tpu.ops.hosvd import hosvd as _hosvd_fn
from lrf_tpu.ops.hosvd import multi_mode_product as _multi_mode_product

__all__ = ["RandInit", "SVDInit", "CoordinateDescent", "QMF", "HOSVD"]


def _pair(v):
    return tuple(v) if isinstance(v, (tuple, list)) else (v, v)


class RandInit:
    """Uniform integer init in bounds (`lrf/factorization/qmf.py:12`).

    Note: like the reference version, returns only `(u, v)` — the reference's
    `QMF.decompose` cannot actually consume it (vestigial upstream); kept for
    API completeness.
    """

    def __init__(self, rank: int, bounds: tuple[float, float], seed: int = 0) -> None:
        self.rank = rank
        self.bounds = bounds
        self.seed = seed

    def __call__(self, x: jnp.ndarray):
        m, n = x.shape[-2], x.shape[-1]
        lo, hi = self.bounds
        key_u, key_v = jax.random.split(jax.random.PRNGKey(self.seed))
        u = jax.random.randint(key_u, (*x.shape[:-2], m, self.rank), int(lo), int(hi) + 1)
        v = jax.random.randint(key_v, (*x.shape[:-2], n, self.rank), int(lo), int(hi) + 1)
        return u.astype(jnp.float32), v.astype(jnp.float32)


class SVDInit:
    """sqrt(s)-balanced truncated-SVD initializer (`lrf/factorization/qmf.py:32`).

    `bounds` enables the clip-minimizing per-component sign selection (see
    `lrf_tpu.ops.bcd.svd_init`)."""

    def __init__(
        self,
        rank: int,
        num_levels: Optional[float] = None,
        method: str = "gram",
        bounds: tuple = (None, None),
    ) -> None:
        self.rank = rank
        self.num_levels = num_levels
        self.method = method
        self.bounds = bounds

    def __call__(self, x: jnp.ndarray):
        return svd_init(
            x, self.rank, num_levels=self.num_levels, method=self.method,
            bounds=self.bounds,
        )


class CoordinateDescent:
    """Block coordinate descent update (`lrf/factorization/qmf.py:74`).

    `factor` selects blocks (0 -> u, 1 -> v, 2 -> w); `project` is a callable
    applied after each column update (the reference accepts a (u, v) pair of
    callables but never uses distinct ones); l2/l1_ratio give elastic-net
    regularization scaled by the opposite dimension, as in the reference.
    """

    def __init__(
        self,
        factor=(0, 1, 2),
        project: Optional[Callable] = None,
        l2=0.0,
        l1_ratio: float = 0.0,
    ) -> None:
        self.factor = (factor,) if isinstance(factor, int) else tuple(factor)
        self.project = project if project is not None else (lambda x: x)
        self.l2 = _pair(l2)
        self.l1_ratio = l1_ratio

    def __call__(self, x, factors):
        u, v, w = factors
        return bcd_sweep(
            x,
            u,
            v,
            w,
            factor=self.factor,
            project=self.project,
            l2=self.l2,
            l1_ratio=self.l1_ratio,
        )

    update_w = staticmethod(update_w)


class QMF:
    """Quantization-aware matrix factorization (`lrf/factorization/qmf.py:167`).

    ``X ~ w0 + w1 * (U @ V^T)`` with integer-bounded U, V. `decompose` runs
    the SVD init plus `num_iters` coordinate-descent sweeps; `reconstruct` is
    static. Operates on `(..., M, N)` batches.
    """

    def __init__(
        self,
        rank: Optional[int],
        num_iters: int = 10,
        bounds=( None, None),
        num_levels: Optional[float] = None,
        factor=(0, 1),
        l2=0.0,
        l1_ratio: float = 0.0,
        init_method: str = "gram",
        verbose: bool = False,
    ) -> None:
        self.rank = rank
        self.num_iters = num_iters
        self.bounds = tuple(bounds)
        # bounds flow into the initializer too: the clip-minimizing sign
        # selection (ops/bcd.py svd_init) must fire identically here and in
        # the functional `qmf_decompose`, or the two public APIs return
        # different factors for the same parameters.
        self.init = SVDInit(
            rank=rank, num_levels=num_levels, method=init_method,
            bounds=self.bounds,
        )
        self.solver = CoordinateDescent(
            factor=factor, project=make_project(self.bounds), l2=l2, l1_ratio=l1_ratio
        )
        self.verbose = verbose

    def decompose(self, x: jnp.ndarray):
        x = jnp.asarray(x).astype(jnp.float32)
        u, v, w = self.init(x)
        for it in range(1, self.num_iters + 1):
            if self.verbose:
                print(f"iter {it}: loss = {qmf_loss(x, u, v, w)}")
            u, v, w = self.solver(x, (u, v, w))
        return u, v, w

    reconstruct = staticmethod(qmf_reconstruct)
    loss = staticmethod(qmf_loss)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        u, v, w = self.decompose(x)
        return self.reconstruct(u, v, w)


class HOSVD:
    """Tucker/HOSVD wrapper (`lrf/factorization/hosvd.py:201`).

    (The reference's `forward` calls a nonexistent `self.fit` — a latent
    upstream bug; here `__call__` round-trips through `decompose`.)
    """

    def __init__(self, rank=None) -> None:
        self.rank = rank

    def decompose(self, x: jnp.ndarray):
        return _hosvd_fn(x, rank=self.rank)

    @staticmethod
    def reconstruct(core, factors):
        return _multi_mode_product(core, factors, transpose=False)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        core, factors = self.decompose(x)
        return self.reconstruct(core, factors)
