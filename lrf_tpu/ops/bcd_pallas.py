"""Fused Pallas TPU kernels for the QMF block-coordinate-descent loop.

The pure-XLA path (`lrf_tpu.ops.bcd`) lowers each of the `num_iters x 2 x R`
Gauss-Seidel column updates as separate fusions with HBM round-trips between
them. These kernels fuse the ENTIRE BCD loop — all sweeps, both factor
updates — into one `pallas_call`, and (round-4 redesign) process a GROUP of
`G` images per grid step so every serialized Gauss-Seidel step is a
`(8, R*8) @ (R*8, M)` matmul instead of a 1-row GEMV that starves the MXU
(the round-3 kernel ran 0.88x XLA at Kodak shapes for exactly that reason).

Layout: factors are **rank-major, group-interleaved with a fixed row
stride of 8** — row ``r*8 + g`` of ``U_all (R*8, M)`` holds image ``g``'s
rank-``r`` column slice (rows with ``g >= G`` are dead zeros). The
Gauss-Seidel loop dynamically indexes the *rank* axis, and Mosaic supports
dynamic slicing on sublane but not lane dims AND requires provably
8-aligned dynamic starts — so rank*8 lives on sublanes and slicing
``[r*8 : r*8+8]`` is always aligned, yielding all images' rank-r rows
contiguously. Cross-image algebra stays separable through masked products:

- ``G_big`` — every image's Gram sits on the block diagonal of one masked
  matmul; the mask ``(row % 8 == col % 8)`` zeroes cross-image inner
  products, so the per-rank row-slice of ``G_big`` drives all images'
  column updates in ONE ``(8, R*8) @ (R*8, M)`` product (each row's
  spurious cross-image coefficients are zero, and dead rows stay
  self-contained).
- ``A_all = V_blkdiag @ X`` with ``X`` laid out ``(G*N, M)``;
  ``V_blkdiag (R*8, G*N)`` is the masked broadcast of ``V_all`` so image
  g's rows only touch image g's ``X`` rows.
- ``X^T U``: computed in the MXU-native orientation ``X @ U^T`` via ONE
  explicit per-sweep transpose of ``U`` (measured: contracting two
  lane-major operands makes Mosaic materialize a hidden transpose of the
  big operand — a scoped-VMEM OOM at rank 26 — so the orientation is
  explicit), then a G-term masked reduction extracts the block diagonal.

Two variants share the column-sweep core, selected by VMEM footprint:

- **X-resident** (`_bcd_resident_kernel`, small/medium M — e.g. the
  chroma stacks): the whole group's ``X`` (and ``U``) is DMA'd into VMEM
  once per group and REUSED across all sweeps — grid ``(B/G, num_iters)``,
  no M-tiling, so the serialized rank-step count is exactly
  ``(B/G) * iters * 2R`` and X HBM traffic is paid once per group.
- **streaming** (`_bcd_stream_kernel`, larger M*G — e.g. Kodak/CLIC Y
  stacks): ``X`` streams through VMEM in M-tiles per sweep (grid
  ``(B/G, num_iters, T)``) with cross-tile accumulators for the V update.

``U`` lives in HBM (`pl.ANY`) aliased input->output — the kernels DMA it
to/from VMEM scratch explicitly, which keeps the custom call's operands
out of scoped-VMEM staging (the round-3 aliasing-through-VMEM staging hit
the 16 MiB scoped limit at rank 26).

Grids execute sequentially on a TPU core, which is exactly the dependency
order of BCD (Gauss-Seidel sweeps are inherently sequential over rank
columns and iterations; rows — the patch axis — are the parallel
dimension). Zero-padding of M — and of B up to the group size — is
mathematically inert for the REAL images: padded X rows/images are zero
and the masks keep every image's update self-contained (padded images and
dead stride rows converge to garbage-but-bounded values the caller
slices off).

Semantics match `lrf/factorization/qmf.py:107-126` (sequential Gauss-Seidel
order preserved; round-half-to-even + clamp projection).

STATUS (round-5 decision, per `experiments/pallas_evidence.json` — the
single source of truth for the auto policy): these kernels are the
**large-M engine**. At CLIC-scale stacks (M >= the 16384 crossover) they
win 1.04-1.60x over XLA and `backend="auto"` selects them. Below the
crossover the group kernel is a **recorded negative result**: despite the
round-4 redesign it measures only 0.97-1.12x at Kodak stacks (M=6144,
r=6-26), because a sub-128-row MXU matmul costs K*M cycles regardless of
row count — the group trick converts 1-row GEMVs into 8-row matmuls whose
FLOP waste is paid in full, so there is no headroom left at that shape.
Auto therefore keeps XLA below the crossover, which also preserves
byte-identity with per-image `qmf_encode` (Pallas accumulation order
flips ~4% of factor entries at round() ties; the large-M contract
explicitly trades that away — see `sharded_qmf_encode_batch`). The
sub-crossover variant remains tested and selectable via
`backend="pallas"` for experimentation.
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
_S = 8  # fixed rank-row stride (Mosaic dynamic sublane starts must be 8-aligned)

# VMEM working-set budget per kernel instance. XLA's default *scoped* VMEM
# limit is 16 MiB, but the v5e's physical VMEM is far larger (a 120 MiB
# scratch allocation compiles and runs — probed on the chip); the kernel
# raises the scoped limit via compiler_params and budgets 75 MiB so whole
# Kodak/CLIC patch-stack groups stay VMEM-resident across all sweeps.
_VMEM_BUDGET = 75 * 1024 * 1024
_VMEM_LIMIT = 112 * 1024 * 1024


def _masks(rank: int):
    """(rowmod, gmask): image slot of each rank-major row, and the
    same-slot block mask for (R*8, R*8) products."""
    rs = rank * _S
    rowmod = lax.rem(
        lax.broadcasted_iota(jnp.int32, (rs, 1), 0), jnp.int32(_S)
    )
    gmask = (
        lax.rem(lax.broadcasted_iota(jnp.int32, (rs, rs), 0), jnp.int32(_S))
        == lax.rem(lax.broadcasted_iota(jnp.int32, (rs, rs), 1), jnp.int32(_S))
    ).astype(jnp.float32)
    return rowmod, gmask


def _group_column_sweep(a_ref, gbig_ref, diag_ref, u_ref, *, rank, lo, hi):
    """Sequential Gauss-Seidel pass over rank rows for a whole image group.

    a_ref: (R*8, T) target products; gbig_ref: (R*8, R*8) block-masked
    Grams; diag_ref: (R*8, 1) scratch for the Gram diagonal; u_ref:
    (R*8, T) factors, updated in place. All rank-major group-interleaved.
    """
    # Hoist the diagonal extraction out of the column loop: one masked
    # reduction per sweep (the Gram is fixed within a sweep) instead of a
    # one-hot dot per column. `diag_ref` is sublane-major so the loop can
    # dynamic-slice it (Mosaic allows dynamic sublane, not lane, indexing).
    g = gbig_ref[:]
    eye = (
        lax.broadcasted_iota(jnp.int32, g.shape, 0)
        == lax.broadcasted_iota(jnp.int32, g.shape, 1)
    ).astype(jnp.float32)
    diag_ref[:] = jnp.sum(g * eye, axis=1, keepdims=True)  # (R*8, 1)

    def body(r, carry):
        g_rows = gbig_ref[pl.ds(r * _S, _S), :]  # (8, R*8)
        g_rr = diag_ref[pl.ds(r * _S, _S), :]  # (8, 1)
        u = u_ref[:]  # (R*8, T)
        u_r = u_ref[pl.ds(r * _S, _S), :]  # (8, T)
        # g_rows' cross-image entries are zero, so this one matmul applies
        # every image's own Gram row; subtract the diagonal term (column r
        # still holds its old value — the Gauss-Seidel exclusion).
        term2 = (
            jax.lax.dot_general(
                g_rows, u, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            - u_r * g_rr
        )
        a_r = a_ref[pl.ds(r * _S, _S), :]
        u_r_new = ((a_r - term2) + _EPS) / (g_rr + _EPS)
        u_ref[pl.ds(r * _S, _S), :] = jnp.clip(jnp.round(u_r_new), lo, hi)
        return carry

    lax.fori_loop(0, rank, body, 0)


def _vblkdiag(vt, rowmod, group: int, n: int):
    """(R*8, G*N) block-diagonal broadcast of V_all: image g's rows carry V
    only in X-block g's columns (dead stride rows match no block)."""
    return jnp.concatenate(
        [vt * (rowmod == gg).astype(jnp.float32) for gg in range(group)],
        axis=1,
    )


def _blockdiag_extract(zt, rowmod, group: int, n: int):
    """(R*8, N) block diagonal of a (R*8, G*N) product (G masked adds)."""
    rs = zt.shape[0]
    out = jnp.zeros((rs, n), jnp.float32)
    for gg in range(group):
        out = out + zt[:, gg * n : (gg + 1) * n] * (rowmod == gg).astype(
            jnp.float32
        )
    return out


# ---------------------------------------------------------------------------
# X-resident variant: grid (nb, num_iters); X and U live in VMEM scratch for
# the whole group; HBM traffic is one X read + one U read/write per group.
# ---------------------------------------------------------------------------


def _bcd_resident_kernel(
    x_hbm, v_in_ref, u_in_hbm, u_hbm, v_out_ref,
    x_s, u_s, ut_t, v_s, a_s, atv_s, g_s, diag_s, sems,
    *, rank, group, n, lo, hi,
):
    # u_in_hbm aliases u_hbm (same HBM buffer); all access goes via u_hbm.
    del u_in_hbm
    bb = pl.program_id(0)
    it = pl.program_id(1)
    rowmod, gmask = _masks(rank)

    @pl.when(it == 0)
    def _():
        cp_x = pltpu.make_async_copy(x_hbm.at[bb], x_s, sems.at[0])
        cp_u = pltpu.make_async_copy(u_hbm.at[bb], u_s, sems.at[1])
        cp_x.start()
        cp_u.start()
        cp_x.wait()
        cp_u.wait()
        v_s[:] = v_in_ref[0]

    x = x_s[:]  # (G*N, M)
    vt = v_s[:]  # (R*8, N)

    # ---- U update ----
    g_s[:] = (
        jax.lax.dot_general(
            vt, vt, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        * gmask
    )  # all images' V^T V on the block diagonal (small operands)
    vblk = _vblkdiag(vt, rowmod, group, n)
    a_s[:] = jax.lax.dot_general(
        vblk, x, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (X_g V_g)^T stacked: (R*8, M)
    _group_column_sweep(a_s, g_s, diag_s, u_s, rank=rank, lo=lo, hi=hi)

    # ---- accumulate A_v = X^T U and G_u = U^T U (native orientation via
    # ONE explicit U transpose per sweep) ----
    ut_t[:] = u_s[:].T  # (M, R*8)
    utt = ut_t[:]
    z = jax.lax.dot_general(
        x, utt, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (G*N, R*8): z[g*N+k, row] = <X_g[:, k], U_row>
    atv_s[:] = _blockdiag_extract(z.T, rowmod, group, n)
    g_s[:] = (
        jax.lax.dot_general(
            u_s[:], utt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * gmask
    )

    # ---- V update ----
    _group_column_sweep(atv_s, g_s, diag_s, v_s, rank=rank, lo=lo, hi=hi)

    @pl.when(it == pl.num_programs(1) - 1)
    def _():
        cp_u = pltpu.make_async_copy(u_s, u_hbm.at[bb], sems.at[1])
        cp_u.start()
        cp_u.wait()
        v_out_ref[0] = v_s[:]


def _resident_vmem_bytes(g: int, rank: int, n: int, m_pad: int) -> int:
    rs = rank * _S
    return 4 * (
        g * n * m_pad  # X
        + 2 * rs * m_pad  # U + U^T
        + rs * m_pad  # A
        + rs * m_pad  # Mosaic's transpose value temporary (measured)
        + 3 * rs * g * n  # vblk / z / z^T temporaries
        + 2 * rs * rs  # Grams + mask
        + 4 * rs * n  # V, A_v, small temps
    )


# ---------------------------------------------------------------------------
# Streaming variant: grid (nb, num_iters, T); X streams in M-tiles per
# sweep; V-update accumulators carry across tiles.
# ---------------------------------------------------------------------------


def _bcd_stream_kernel(
    x_ref, v_in_ref, u_in_hbm, u_hbm, v_out_ref,
    u_s, ut_t, v_s, a_s, atv_s, gu_s, gv_s, diag_s, sems,
    *, rank, group, n, lo, hi, num_tiles, tile,
):
    # u_in_hbm aliases u_hbm (same HBM buffer); all access goes via u_hbm.
    del u_in_hbm
    bb = pl.program_id(0)
    it = pl.program_id(1)
    t = pl.program_id(2)
    rowmod, gmask = _masks(rank)

    @pl.when(jnp.logical_and(it == 0, t == 0))
    def _():
        v_s[:] = v_in_ref[0]

    # U tile: HBM (aliased in/out) -> VMEM scratch
    cp_in = pltpu.make_async_copy(
        u_hbm.at[bb, :, pl.ds(t * tile, tile)], u_s, sems.at[0]
    )
    cp_in.start()

    x = x_ref[0]  # (G*N, TILE)
    vt = v_s[:]  # (R*8, N)

    gv_s[:] = (
        jax.lax.dot_general(
            vt, vt, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        * gmask
    )
    vblk = _vblkdiag(vt, rowmod, group, n)
    a_s[:] = jax.lax.dot_general(
        vblk, x, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (R*8, TILE)
    cp_in.wait()
    _group_column_sweep(a_s, gv_s, diag_s, u_s, rank=rank, lo=lo, hi=hi)
    cp_out = pltpu.make_async_copy(
        u_s, u_hbm.at[bb, :, pl.ds(t * tile, tile)], sems.at[1]
    )
    cp_out.start()

    ut_t[:] = u_s[:].T  # (TILE, R*8)
    utt = ut_t[:]
    z = jax.lax.dot_general(
        x, utt, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (G*N, R*8)
    atv = _blockdiag_extract(z.T, rowmod, group, n)
    utu = (
        jax.lax.dot_general(
            u_s[:], utt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * gmask
    )

    @pl.when(t == 0)
    def _():
        atv_s[:] = atv
        gu_s[:] = utu

    @pl.when(t != 0)
    def _():
        atv_s[:] = atv_s[:] + atv
        gu_s[:] = gu_s[:] + utu

    @pl.when(t == num_tiles - 1)
    def _():
        _group_column_sweep(atv_s, gu_s, diag_s, v_s, rank=rank, lo=lo, hi=hi)

    cp_out.wait()

    @pl.when(jnp.logical_and(it == pl.num_programs(1) - 1, t == num_tiles - 1))
    def _():
        v_out_ref[0] = v_s[:]


def _stream_tile(m_pad: int, rank: int, g: int, n: int, tile_cap: int) -> int:
    """Tile size keeping the streaming working set in budget: the
    (G*N, tile) X block double-buffered by the pipeline plus three
    (R*8, tile) buffers (U, U^T, A). Sized to divide M evenly (the last
    tile would otherwise carry up to tile-1 rows of zero padding)."""
    # X block double-buffered + four (R*8, tile) buffers: U, U^T, A, and
    # Mosaic's transpose value temporary (measured via scoped-OOM sizes).
    per_unit = (2 * g * n + 4 * rank * _S) * 4
    tile_max = min(tile_cap, (_VMEM_BUDGET - 512 * 1024) // per_unit)
    tile_max = max(128, tile_max)
    num_tiles = -(-m_pad // tile_max)
    return -(-(-(-m_pad // num_tiles)) // 128) * 128


def _pick_group(b: int, m: int, rank: int, n: int):
    """(group, resident?): the largest group (of the 8 stride slots) whose
    X-resident working set fits the VMEM budget; else the largest group
    that still leaves a useful streaming tile."""
    m_pad = -(-m // 128) * 128
    for g in (8, 4, 2, 1):
        if g > b and g != 1:
            continue
        if _resident_vmem_bytes(g, rank, n, m_pad) <= _VMEM_BUDGET:
            return g, True
    for g in (8, 4, 2, 1):
        if g > b and g != 1:
            continue
        if _stream_tile(m_pad, rank, g, n, 1 << 30) >= 512:
            return g, False
    return 1, False


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_iters", "bounds", "tile_m", "interpret", "group", "variant"
    ),
)
def bcd_pallas(
    x: jnp.ndarray,
    u0: jnp.ndarray,
    v0: jnp.ndarray,
    num_iters: int = 10,
    bounds: tuple[float, float] = (-16, 15),
    tile_m: int = 8192,
    interpret: bool = False,
    group: int | None = None,
    variant: str | None = None,
):
    """Run `num_iters` BCD sweeps on `(B, M, N)` with factors `(B, M, R)`,
    `(B, N, R)`. Returns the updated `(u, v)` (integer-valued float32).

    Equivalent to `num_iters` iterations of
    `lrf_tpu.ops.bcd.bcd_sweep(..., factor=(0, 1))` with integer projection.

    `group` images are processed per grid step (batch padded up to a
    multiple; auto-picked to fill VMEM when None); each Gauss-Seidel step
    then updates all `group` images' rank-r rows with one
    (8, R*8) @ (R*8, M) MXU product, cutting the serialized step count
    `group`-fold versus per-image processing. Small/medium M runs the
    X-resident variant (X read from HBM once per group, no per-sweep
    re-streaming); larger M*G streams X in tiles.
    """
    assert x.ndim == 3 and u0.ndim == 3 and v0.ndim == 3
    if num_iters == 0:
        # zero-size grid never runs the kernel; outputs would be undefined
        return u0.astype(jnp.float32), v0.astype(jnp.float32)
    b, m, n = x.shape
    r = u0.shape[-1]
    if variant == "legacy" or (variant is None and m >= _LEGACY_MIN_M):
        # Large patch stacks (CLIC scale): the group design's dense
        # block-diagonal products cost 8x the essential GEMM FLOPs, which
        # scales with M and loses there (measured: 0.87x/1.03x XLA at
        # M=49152 vs the per-image kernel's 1.06x/1.57x); per-image
        # 1-row GEMVs amortize over the long rows instead.
        return _bcd_pallas_legacy(
            x, u0, v0, num_iters=num_iters, bounds=bounds, tile_m=tile_m,
            interpret=interpret,
        )
    if group is None:
        g, resident = _pick_group(b, m, r, n)
    else:
        g = max(1, min(group, _S))
        m_pad128 = -(-m // 128) * 128
        resident = _resident_vmem_bytes(g, r, n, m_pad128) <= _VMEM_BUDGET
    b_pad = -(-b // g) * g
    nb = b_pad // g
    lo, hi = float(math.ceil(bounds[0])), float(math.floor(bounds[1]))

    if resident:
        tile = -(-m // 128) * 128
        num_tiles = 1
    else:
        tile = _stream_tile(-(-m // 128) * 128, r, g, n, tile_m)
        num_tiles = -(-m // tile)
    m_pad = num_tiles * tile

    x = x.astype(jnp.float32)
    u0 = u0.astype(jnp.float32)
    v0 = v0.astype(jnp.float32)
    if m_pad != m:
        x = jnp.pad(x, ((0, 0), (0, m_pad - m), (0, 0)))
        u0 = jnp.pad(u0, ((0, 0), (0, m_pad - m), (0, 0)))
    if b_pad != b:
        x = jnp.pad(x, ((0, b_pad - b), (0, 0), (0, 0)))
        u0 = jnp.pad(u0, ((0, b_pad - b), (0, 0), (0, 0)))
        v0 = jnp.pad(v0, ((0, b_pad - b), (0, 0), (0, 0)))

    # HBM layouts (one XLA transpose in, one out — never a Mosaic relayout):
    #   X: (nb, G*N, M_pad), row g*N + k = X[g][:, k]
    #   U: (nb, R*8, M_pad), row r*8 + g = U[g][:, r]  (ANY space, aliased;
    #      slots g >= G are dead zeros so dynamic starts stay 8-aligned)
    #   V: (nb, R*8, N)
    xg = jnp.transpose(x.reshape(nb, g, m_pad, n), (0, 1, 3, 2)).reshape(
        nb, g * n, m_pad
    )
    ug = jnp.transpose(u0.reshape(nb, g, m_pad, r), (0, 3, 1, 2))
    vg = jnp.transpose(v0.reshape(nb, g, n, r), (0, 3, 1, 2))
    if g < _S:  # dead stride slots
        ug = jnp.pad(ug, ((0, 0), (0, 0), (0, _S - g), (0, 0)))
        vg = jnp.pad(vg, ((0, 0), (0, 0), (0, _S - g), (0, 0)))
    ug = ug.reshape(nb, r * _S, m_pad)
    vg = vg.reshape(nb, r * _S, n)

    rs = r * _S
    common = dict(rank=r, group=g, n=n, lo=lo, hi=hi)
    if resident:
        kernel = functools.partial(_bcd_resident_kernel, **common)
        grid = (nb, num_iters)
        in_specs = [
            pl.BlockSpec(memory_space=pl.ANY),  # X (whole array, HBM)
            pl.BlockSpec((1, rs, n), lambda bb, it: (bb, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),  # U (aliased, HBM)
        ]
        out_specs = [
            pl.BlockSpec(memory_space=pl.ANY),  # U out (same HBM buffer)
            pl.BlockSpec((1, rs, n), lambda bb, it: (bb, 0, 0)),
        ]
        scratch = [
            pltpu.VMEM((g * n, m_pad), jnp.float32),  # X (resident)
            pltpu.VMEM((rs, m_pad), jnp.float32),  # U
            pltpu.VMEM((m_pad, rs), jnp.float32),  # U^T (per sweep)
            pltpu.VMEM((rs, n), jnp.float32),  # V
            pltpu.VMEM((rs, m_pad), jnp.float32),  # A
            pltpu.VMEM((rs, n), jnp.float32),  # A_v
            pltpu.VMEM((rs, rs), jnp.float32),  # Gram (shared U/V phases)
            pltpu.VMEM((rs, 1), jnp.float32),  # Gram diagonal
            pltpu.SemaphoreType.DMA((2,)),
        ]
    else:
        kernel = functools.partial(
            _bcd_stream_kernel, num_tiles=num_tiles, tile=tile, **common
        )
        grid = (nb, num_iters, num_tiles)
        in_specs = [
            pl.BlockSpec((1, g * n, tile), lambda bb, it, t: (bb, 0, t)),
            pl.BlockSpec((1, rs, n), lambda bb, it, t: (bb, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),  # U (aliased, HBM)
        ]
        out_specs = [
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, rs, n), lambda bb, it, t: (bb, 0, 0)),
        ]
        scratch = [
            pltpu.VMEM((rs, tile), jnp.float32),  # U tile
            pltpu.VMEM((tile, rs), jnp.float32),  # U^T tile
            pltpu.VMEM((rs, n), jnp.float32),  # V
            pltpu.VMEM((rs, tile), jnp.float32),  # A
            pltpu.VMEM((rs, n), jnp.float32),  # A_v accumulator
            pltpu.VMEM((rs, rs), jnp.float32),  # U^T U accumulator
            pltpu.VMEM((rs, rs), jnp.float32),  # V^T V (per tile)
            pltpu.VMEM((rs, 1), jnp.float32),  # Gram diagonal
            pltpu.SemaphoreType.DMA((2,)),
        ]

    u_out, v_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((nb, rs, m_pad), jnp.float32),
            jax.ShapeDtypeStruct((nb, rs, n), jnp.float32),
        ],
        scratch_shapes=scratch,
        input_output_aliases={2: 0},
        interpret=interpret,
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(xg, vg, ug)
    # invert the group-interleaved layouts, drop dead slots + padding
    u = jnp.transpose(
        u_out.reshape(nb, r, _S, m_pad)[:, :, :g], (0, 2, 3, 1)
    ).reshape(b_pad, m_pad, r)[:b, :m, :]
    v = jnp.transpose(
        v_out.reshape(nb, r, _S, n)[:, :, :g], (0, 2, 3, 1)
    ).reshape(b_pad, n, r)[:b]
    return u, v


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


# ---------------------------------------------------------------------------
# Legacy per-image variant (round-3 design), kept as the LARGE-M engine:
# grid (B, num_iters, T), rank-major (R, tile) factors, 1-row GEMV column
# updates. At CLIC-scale M the group design's dense block-diagonal products
# (8x the essential GEMM FLOPs, scaling with M) lose to this kernel, whose
# per-image products do only essential work and whose 1-row GEMVs amortize
# over very long rows (measured: 1.06x XLA at M=49152 r=13, 1.57x at r=32).
# ---------------------------------------------------------------------------

_LEGACY_MIN_M = 16384


def _legacy_column_sweep(a_ref, g_ref, diag_ref, u_ref, *, rank, lo, hi):
    """Per-image sequential Gauss-Seidel pass (width-1 dynamic slices)."""
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


def _legacy_bcd_kernel(
    x_ref, v_in_ref, u_in_ref, u_out_ref, v_out_ref,
    v_s, atv_s, gu_s, gv_s, a_s, ut_s, diag_s,
    *, rank, lo, hi, num_tiles,
):
    it = pl.program_id(1)
    t = pl.program_id(2)

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
    # kernel instead of a Mosaic relayout per sweep.
    ut_s[:] = u_in_ref[0]  # (R, TILE_M)
    _legacy_column_sweep(a_s, gv_s, diag_s, ut_s, rank=rank, lo=lo, hi=hi)
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
        _legacy_column_sweep(atv_s, gu_s, diag_s, v_s, rank=rank, lo=lo, hi=hi)

    @pl.when(jnp.logical_and(it == pl.num_programs(1) - 1, t == num_tiles - 1))
    def _():
        v_out_ref[0] = v_s[:].T


def _bcd_pallas_legacy(
    x, u0, v0, *, num_iters, bounds, tile_m=8192, interpret=False,
    batch_chunk=8,
):
    b, m, n = x.shape
    if b > batch_chunk:
        # Bound XLA scoped-VMEM staging of the aliased U operand (grows
        # with B): sequential chunks via lax.map (the grid is sequential
        # per core anyway).
        pad = (-b) % batch_chunk
        if pad:
            x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
            u0 = jnp.pad(u0, ((0, pad), (0, 0), (0, 0)))
            v0 = jnp.pad(v0, ((0, pad), (0, 0), (0, 0)))
        nb = (b + pad) // batch_chunk
        r = u0.shape[-1]

        def run_chunk(args):
            xc, uc, vc = args
            return _bcd_pallas_legacy(
                xc, uc, vc, num_iters=num_iters, bounds=bounds,
                tile_m=tile_m, interpret=interpret, batch_chunk=batch_chunk,
            )

        u, v = jax.lax.map(
            run_chunk,
            (
                x.reshape(nb, batch_chunk, m, n),
                u0.reshape(nb, batch_chunk, m, u0.shape[-1]),
                v0.reshape(nb, batch_chunk, n, v0.shape[-1]),
            ),
        )
        return (
            u.reshape(nb * batch_chunk, m, r)[:b],
            v.reshape(nb * batch_chunk, n, r)[:b],
        )
    r = u0.shape[-1]
    lo, hi = float(math.ceil(bounds[0])), float(math.floor(bounds[1]))

    tile_m = min(tile_m, max(8, -(-m // 8) * 8))
    m_pad = -(-m // tile_m) * tile_m
    if m_pad != m:
        x = jnp.pad(x, ((0, 0), (0, m_pad - m), (0, 0)))
        u0 = jnp.pad(u0, ((0, 0), (0, m_pad - m), (0, 0)))
    num_tiles = m_pad // tile_m

    x = x.astype(jnp.float32)
    # U travels rank-major (B, R, M): ONE XLA transpose here (and one on
    # the way out) instead of a per-sweep Mosaic relayout in the kernel.
    u0 = jnp.swapaxes(u0.astype(jnp.float32), -1, -2)  # (B, R, M_pad)
    v0 = v0.astype(jnp.float32)

    kernel = functools.partial(
        _legacy_bcd_kernel, rank=r, lo=lo, hi=hi, num_tiles=num_tiles
    )
    grid = (x.shape[0], num_iters, num_tiles)
    u_out, v_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_m, n), lambda bb, it, t: (bb, t, 0)),
            pl.BlockSpec((1, n, r), lambda bb, it, t: (bb, 0, 0)),
            pl.BlockSpec((1, r, tile_m), lambda bb, it, t: (bb, 0, t)),
        ],
        out_specs=[
            pl.BlockSpec((1, r, tile_m), lambda bb, it, t: (bb, 0, t)),
            pl.BlockSpec((1, n, r), lambda bb, it, t: (bb, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((x.shape[0], r, m_pad), jnp.float32),
            jax.ShapeDtypeStruct((x.shape[0], n, r), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((r, n), jnp.float32),  # V (rank-major)
            pltpu.VMEM((r, n), jnp.float32),  # A_v accumulator
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

