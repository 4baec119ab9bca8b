"""Fused Pallas TPU kernel for the QMF block-coordinate-descent loop.

The pure-XLA path (`lrf_tpu.ops.bcd`) lowers each of the `num_iters x 2 x R`
Gauss-Seidel column updates as separate fusions with HBM round-trips between
them. This kernel fuses the ENTIRE BCD loop — all sweeps, both factor
updates — into one `pallas_call`:

- grid `(B, num_iters, T)` over batch, sweep, and M-tiles; TPU grids execute
  sequentially on a core, which is exactly the dependency order of BCD
  (Gauss-Seidel sweeps are inherently sequential over rank columns and
  iterations; rows — the patch axis — are the parallel/tiled dimension).
- `V` and the accumulators `A_v = X^T U`, `G = U^T U` persist in VMEM
  scratch across grid steps; `U` tiles stream HBM->VMEM->HBM via
  input/output aliasing; `X` tiles stream in once per sweep.
- factors are held **rank-major** (`(R, tile)`) inside the kernel AND in
  HBM (`U` as `(B, R, M)`; the caller pays one XLA transpose at entry/exit
  instead of a Mosaic relayout per sweep): the Gauss-Seidel loop
  dynamically indexes the *rank* axis, and Mosaic supports dynamic slicing
  on sublane/leading dims but not the lane dim — so the rank axis lives on
  sublanes and each column update is a `(1, R) @ (R, tile)` MXU GEMV plus
  VPU elementwise work. The Gram diagonal is extracted once per sweep into
  an `(R, 1)` scratch the column loop dynamic-slices (no per-column
  one-hot reductions).
- per tile and sweep: `G = V^T V` (MXU), `A = V^T X_tile^T` (MXU), the
  sequential rank loop with round-half-to-even + clamp projection
  (`lrf/factorization/qmf.py:107-126` semantics; the Gauss-Seidel exclusion
  is `G[r, :] U - U[r, :] G[r, r]`), then accumulation of `A_v`/`G_u`; the
  last tile of a sweep runs the V column loop; the last sweep writes V out.

Zero-padding of M to the tile size is mathematically inert: padded X rows
are zero, so their projected U rows are `round(0) = 0` and contribute
nothing to `X^T U` or `U^T U`.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-16


def _column_sweep_ref(a_ref, g_ref, diag_ref, u_ref, *, rank, lo, hi):
    """Sequential Gauss-Seidel pass over rank rows of `u_ref`.

    a_ref: (R, T) target products; g_ref: (R, R) Gram; diag_ref: (R, 1)
    scratch for the Gram diagonal; u_ref: (R, T) factor, updated in place.
    All rank-major.
    """
    # Hoist the diagonal extraction out of the column loop: one masked
    # reduction per sweep (the Gram is fixed within a sweep) instead of a
    # one-hot dot per column. `diag_ref` is sublane-major so the loop can
    # dynamic-slice it (Mosaic allows dynamic sublane, not lane, indexing).
    g = g_ref[:]
    eye = (
        lax.broadcasted_iota(jnp.int32, g.shape, 0)
        == lax.broadcasted_iota(jnp.int32, g.shape, 1)
    ).astype(jnp.float32)
    diag_ref[:] = jnp.sum(g * eye, axis=1, keepdims=True)  # (R, 1)

    def body(r, carry):
        g_row = g_ref[pl.ds(r, 1), :]  # (1, R)
        g_rr = diag_ref[pl.ds(r, 1), :]  # (1, 1)
        u = u_ref[:]  # (R, T)
        u_r = u_ref[pl.ds(r, 1), :]  # (1, T)
        term2 = (
            jax.lax.dot_general(
                g_row, u, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            - u_r * g_rr
        )
        a_r = a_ref[pl.ds(r, 1), :]
        u_r_new = ((a_r - term2) + _EPS) / (g_rr + _EPS)
        u_ref[pl.ds(r, 1), :] = jnp.clip(jnp.round(u_r_new), lo, hi)
        return carry

    lax.fori_loop(0, rank, body, 0)


def _bcd_kernel(
    x_ref, v_in_ref, u_in_ref, u_out_ref, v_out_ref,
    v_s, atv_s, gu_s, gv_s, a_s, ut_s, diag_s,
    *, rank, lo, hi, num_tiles,
):
    it = pl.program_id(1)
    t = pl.program_id(2)

    # Load V (rank-major) into scratch at the start of each image's loop.
    @pl.when(jnp.logical_and(it == 0, t == 0))
    def _():
        v_s[:] = v_in_ref[0].T  # (R, N)

    x = x_ref[0]  # (TILE_M, N)
    vt = v_s[:]  # (R, N)

    # ---- U update for this tile ----
    gv_s[:] = jax.lax.dot_general(
        vt, vt, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # V^T V as (R, R)
    a_s[:] = jax.lax.dot_general(
        vt, x, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (X V)^T = (R, TILE_M)
    # u_in aliases u_out's buffer: at sweep `it` this block holds the tile
    # written at sweep `it-1` (or the initializer at it=0). U is rank-major
    # (R, TILE_M) in HBM too — the caller transposes once outside the
    # kernel, instead of a (TILE_M, R) <-> (R, TILE_M) Mosaic relayout here
    # on every load/store of every sweep (the round-2 profile's dominant
    # kernel cost).
    ut_s[:] = u_in_ref[0]  # (R, TILE_M)
    _column_sweep_ref(a_s, gv_s, diag_s, ut_s, rank=rank, lo=lo, hi=hi)
    ut = ut_s[:]
    u_out_ref[0] = ut

    # ---- accumulate A_v^T = U^T X (R, N) and G_u = U^T U (R, R) ----
    xtu = jax.lax.dot_general(
        ut, x, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (R, N)
    utu = jax.lax.dot_general(
        ut, ut, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (R, R)

    @pl.when(t == 0)
    def _():
        atv_s[:] = xtu
        gu_s[:] = utu

    @pl.when(t != 0)
    def _():
        atv_s[:] = atv_s[:] + xtu
        gu_s[:] = gu_s[:] + utu

    # ---- V update after the last tile of the sweep ----
    @pl.when(t == num_tiles - 1)
    def _():
        _column_sweep_ref(atv_s, gu_s, diag_s, v_s, rank=rank, lo=lo, hi=hi)

    @pl.when(jnp.logical_and(it == pl.num_programs(1) - 1, t == num_tiles - 1))
    def _():
        v_out_ref[0] = v_s[:].T


@functools.partial(
    jax.jit,
    static_argnames=("num_iters", "bounds", "tile_m", "interpret", "batch_chunk"),
)
def bcd_pallas(
    x: jnp.ndarray,
    u0: jnp.ndarray,
    v0: jnp.ndarray,
    num_iters: int = 10,
    bounds: tuple[float, float] = (-16, 15),
    tile_m: int = 8192,
    interpret: bool = False,
    batch_chunk: int = 8,
):
    """Run `num_iters` BCD sweeps on `(B, M, N)` with factors `(B, M, R)`,
    `(B, N, R)`. Returns the updated `(u, v)` (integer-valued float32).

    Equivalent to `num_iters` iterations of
    `lrf_tpu.ops.bcd.bcd_sweep(..., factor=(0, 1))` with integer projection.

    Batches larger than `batch_chunk` run as sequential `pallas_call`s over
    batch chunks via `lax.map`: XLA's scoped-VMEM stack for the custom
    call's aliased operand copies grows linearly with B (~0.77 MiB/image at
    Kodak shapes against a 16 MiB limit), so an unchunked call stops
    compiling around B~20; chunking bounds it for any B at no measurable
    cost (the grid is sequential per core anyway).
    """
    assert x.ndim == 3 and u0.ndim == 3 and v0.ndim == 3
    if num_iters == 0:
        # zero-size grid never runs the kernel; outputs would be undefined
        return u0.astype(jnp.float32), v0.astype(jnp.float32)
    b, m, n = x.shape
    if b > batch_chunk:
        pad = (-b) % batch_chunk
        if pad:
            x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
            u0 = jnp.pad(u0, ((0, pad), (0, 0), (0, 0)))
            v0 = jnp.pad(v0, ((0, pad), (0, 0), (0, 0)))
        nb = (b + pad) // batch_chunk

        def run_chunk(args):
            xc, uc, vc = args
            return bcd_pallas(
                xc, uc, vc, num_iters=num_iters, bounds=bounds,
                tile_m=tile_m, interpret=interpret, batch_chunk=batch_chunk,
            )

        r = u0.shape[-1]
        u, v = jax.lax.map(
            run_chunk,
            (
                x.reshape(nb, batch_chunk, m, n),
                u0.reshape(nb, batch_chunk, m, r),
                v0.reshape(nb, batch_chunk, n, r),
            ),
        )
        return (
            u.reshape(nb * batch_chunk, m, r)[:b],
            v.reshape(nb * batch_chunk, n, r)[:b],
        )
    r = u0.shape[-1]
    lo, hi = float(math.ceil(bounds[0])), float(math.floor(bounds[1]))

    # Default tile covers a whole Kodak/CLIC-scale patch stack: fewer tiles
    # means U streams HBM<->VMEM once per sweep and the V accumulators skip
    # the cross-tile staging — measured ~40% faster than 1 KiB-row tiles at
    # bench shapes ((24, 6144, 64) r=13: 3.2 ms vs 5.4 ms for 10 sweeps).
    # VMEM stays small: the (tile, N) X block at 8192 rows is 2 MiB f32.
    tile_m = min(tile_m, max(8, -(-m // 8) * 8))
    m_pad = -(-m // tile_m) * tile_m
    if m_pad != m:
        x = jnp.pad(x, ((0, 0), (0, m_pad - m), (0, 0)))
        u0 = jnp.pad(u0, ((0, 0), (0, m_pad - m), (0, 0)))
    num_tiles = m_pad // tile_m

    x = x.astype(jnp.float32)
    # U travels rank-major (B, R, M): ONE XLA transpose here (and one on the
    # way out) instead of a Mosaic (TILE_M, R) <-> (R, TILE_M) relayout on
    # every U load+store of every sweep inside the kernel.
    u0 = jnp.swapaxes(u0.astype(jnp.float32), -1, -2)  # (B, R, M_pad)
    v0 = v0.astype(jnp.float32)

    kernel = functools.partial(
        _bcd_kernel, rank=r, lo=lo, hi=hi, num_tiles=num_tiles
    )
    grid = (b, num_iters, num_tiles)
    u_out, v_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, tile_m, n), lambda bb, it, t: (bb, t, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, n, r), lambda bb, it, t: (bb, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, r, tile_m), lambda bb, it, t: (bb, 0, t), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, r, tile_m), lambda bb, it, t: (bb, 0, t), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, n, r), lambda bb, it, t: (bb, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, r, m_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, n, r), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((r, n), jnp.float32),  # V (rank-major)
            pltpu.VMEM((r, n), jnp.float32),  # A_v accumulator (rank-major)
            pltpu.VMEM((r, r), jnp.float32),  # U^T U accumulator
            pltpu.VMEM((r, r), jnp.float32),  # V^T V (per tile)
            pltpu.VMEM((r, tile_m), jnp.float32),  # A = (X V)^T
            pltpu.VMEM((r, tile_m), jnp.float32),  # U tile (rank-major)
            pltpu.VMEM((r, 1), jnp.float32),  # Gram diagonal (per sweep)
        ],
        input_output_aliases={2: 0},
        interpret=interpret,
    )(x, v0, u0)
    return jnp.swapaxes(u_out, -1, -2)[:, :m, :], v_out


def qmf_decompose_pallas(
    x: jnp.ndarray,
    rank: int,
    num_iters: int = 10,
    bounds: tuple[float, float] = (-16, 15),
    init_method: str = "gram",
    tile_m: int = 8192,
    interpret: bool = False,
):
    """SVD init + fused-Pallas BCD. Drop-in for the `factor=(0, 1)` path of
    `lrf_tpu.ops.bcd.qmf_decompose` on `(B, M, N)` batches."""
    from lrf_tpu.ops.bcd import svd_init

    x = x.astype(jnp.float32)
    u0, v0, w = svd_init(x, rank, method=init_method, bounds=bounds)
    u, v = bcd_pallas(
        x, u0, v0, num_iters=num_iters, bounds=bounds, tile_m=tile_m, interpret=interpret
    )
    return u, v, w
