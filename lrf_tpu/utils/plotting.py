"""LOESS smoothing and rate-distortion plotting.

Implements the analysis behaviors that define the reference's published RD
curves (`lrf/utils/misc.py:276-578` in pashtari/lrf) with an independent,
fully vectorized design:

- `LOESS`: locally-weighted polynomial regression. The behavioral contract
  (matching the reference) is: tricube weights over the k = ceil(frac * n)
  nearest neighbours with the k-th distance as the span, polynomial degree
  1 or 2, per-query weighted least squares where the weight enters the
  residual *linearly* (i.e. effective weighting by w^2 in the normal
  equations), and leave-one-out cross-validated grid search over
  (frac, degree). The implementation here shares no structure with the
  reference's per-point Python loop: neighbourhoods are realized as a dense
  query-by-sample tricube weight matrix (points at or beyond the span get
  exactly zero weight, so explicit k-NN index selection is unnecessary),
  all query fits solve one batched, query-centered normal-equation system,
  and LOOCV evaluates every held-out point in a single pass by masking the
  weight matrix diagonal instead of refitting n times — O(n^2) work total
  versus the reference's O(n^2) *model refits*.
- `Plot`: group the raw sweep rows by (data, method), LOESS-interpolate each
  group onto a common bpp grid (grid-searching frac in 0.15..0.65 step 0.1,
  degree in {1, 2} like `utils/misc.py:463`), mark extrapolated grid points,
  and draw seaborn line plots with a solid/dashed split and standard-error
  bands.

Everything is host-side analysis (numpy/pandas/seaborn); results produced by
`lrf_tpu.utils.eval.eval_compression` use the reference's column names, so
either implementation's stored JSONs plot identically.
"""

from __future__ import annotations

import os
import re
from itertools import product
from typing import Optional, Sequence

import numpy as np

__all__ = ["LOESS", "Plot"]


def _tricube_weights(dist: np.ndarray, k: int) -> np.ndarray:
    """Dense (Q, N) tricube weight matrix for k-nearest-neighbour LOESS.

    For each query row, the span is the k-th smallest distance; the tricube
    kernel (1 - (d/span)^3)^3 vanishes for d >= span, so weighting *all*
    samples is exactly equivalent to selecting the k nearest first (boundary
    ties all receive weight zero either way). Rows whose span is zero
    (duplicate abscissae) degenerate to indicator weights on the zero-distance
    samples.
    """
    k = min(max(k, 1), dist.shape[1])
    span = np.partition(dist, k - 1, axis=1)[:, k - 1 : k]  # (Q, 1)
    with np.errstate(divide="ignore", invalid="ignore"):
        r = np.where(span > 0, dist / span, np.where(dist == 0, 0.0, np.inf))
    w = 1.0 - r**3
    np.clip(w, 0.0, None, out=w)
    return w**3


def _fit_predict(
    x: np.ndarray,
    y: np.ndarray,
    weights: np.ndarray,
    x_query: np.ndarray,
    degree: int,
) -> np.ndarray:
    """Batched weighted polynomial fits, one per query point.

    Solves, for every query q, the least-squares problem
    ``min_beta || W_q (B_q beta - y) ||`` with ``W_q = diag(weights[q])`` and
    B_q the degree-`degree` polynomial basis *centered at x_query[q]* (the
    centering changes conditioning, not the fitted polynomial), then returns
    the fit's value at the query point — the constant basis coefficient.
    Singular neighbourhoods (fewer distinct samples than coefficients) fall
    back to the minimum-norm solution via pseudo-inverse.
    """
    # (Q, N, degree+1) centered monomial basis
    t = x[None, :] - x_query[:, None]
    basis = t[:, :, None] ** np.arange(degree + 1)
    w2 = weights**2  # diag(w) applied to both sides of the lstsq system
    gram = np.einsum("qna,qn,qnb->qab", basis, w2, basis)
    rhs = np.einsum("qna,qn,n->qa", basis, w2, y)
    try:
        coef = np.linalg.solve(gram, rhs[..., None])[..., 0]
    except np.linalg.LinAlgError:
        coef = np.stack(
            [np.linalg.pinv(g) @ r for g, r in zip(gram, rhs)]
        )
    return coef[:, 0]


class LOESS:
    """Locally-weighted polynomial regression (behavioral spec:
    `lrf/utils/misc.py:276-412`; independent vectorized implementation —
    see module docstring)."""

    def __init__(self, frac=0.3, degree=1) -> None:
        self.frac = np.atleast_1d(frac)
        self.degree = np.atleast_1d(degree)
        self.x: Optional[np.ndarray] = None
        self.y: Optional[np.ndarray] = None
        self.best_frac: Optional[float] = None
        self.best_degree: Optional[int] = None

    def fit(self, x, y) -> "LOESS":
        self.x = np.asarray(x, dtype=float)
        self.y = np.asarray(y, dtype=float)
        if len(self.frac) > 1 or len(self.degree) > 1:
            self.best_frac, self.best_degree = self._grid_search()
        else:
            self.best_frac, self.best_degree = self.frac[0], self.degree[0]
        return self

    def _grid_search(self):
        best = (np.inf, self.frac[0], self.degree[0])
        for frac, degree in product(self.frac, self.degree):
            score = self._loocv(frac, degree)
            if score < best[0]:
                best = (score, frac, degree)
        return best[1], best[2]

    def _loocv(self, frac: float, degree: int) -> float:
        """Mean squared leave-one-out prediction error, in one pass.

        Holding out sample i and predicting at x[i] is realized by masking
        the i-th distance to infinity (weight zero) while sizing the
        neighbourhood as k = ceil(frac * (n-1)) — identical to refitting on
        the n-1 remaining samples, without n refits.
        """
        n = len(self.x)
        if n < 2:
            return np.inf
        dist = np.abs(self.x[:, None] - self.x[None, :])
        np.fill_diagonal(dist, np.inf)
        k = int(np.ceil(frac * (n - 1)))
        w = _tricube_weights(dist, k)
        pred = _fit_predict(self.x, self.y, w, self.x, int(degree))
        return float(np.mean((self.y - pred) ** 2))

    def predict(self, x_new) -> np.ndarray:
        x_new = np.asarray(x_new, dtype=float)
        k = int(np.ceil(self.best_frac * len(self.x)))
        dist = np.abs(x_new[:, None] - self.x[None, :])
        w = _tricube_weights(dist, k)
        return _fit_predict(self.x, self.y, w, x_new, int(self.best_degree))


class Plot:
    """Groupby-interpolate RD curves and seaborn plotting (`lrf/utils/misc.py:415`)."""

    def __init__(self, data, columns: Optional[Sequence[str]] = None) -> None:
        import pandas as pd

        self.data = pd.DataFrame(data, columns=columns)
        self.x: Optional[str] = None
        self.y: Optional[str] = None
        self.x_values = None
        self.fig = None
        self.ax = None

    def interpolate(self, x: str, y: str, x_values, groupby=("data", "method")):
        import pandas as pd

        self.x, self.y, self.x_values = x, y, x_values
        groupby = [groupby] if isinstance(groupby, str) else list(groupby)

        chunks = []
        for keys, grp in self.data.groupby(groupby):
            grp = grp.drop_duplicates(self.x)
            interp = pd.DataFrame({**dict(zip(groupby, keys)), self.x: x_values})
            loess = LOESS(frac=np.arange(0.15, 0.75, 0.1), degree=[1, 2])
            loess.fit(grp[self.x], grp[self.y])
            interp[self.y] = loess.predict(x_values)
            x_min, x_max = grp[self.x].min(), grp[self.x].max()
            interp["extrapolated"] = (np.asarray(x_values) < x_min) | (
                np.asarray(x_values) > x_max
            )
            chunks.append(interp)
        self.data = pd.concat(chunks)
        return self.data

    def plot(
        self,
        x: str,
        y: str,
        groupby: str = "method",
        errorbar: Optional[str] = "se",
        dashed: bool = True,
        xlim=(None, None),
        ylim=(None, None),
        legend_labels: Optional[Sequence[str]] = None,
    ):
        import matplotlib.pyplot as plt
        import pandas as pd
        import seaborn as sns

        self.x, self.y = x, y
        if self.data[groupby].dtype.kind in "ifub":
            # numeric ablation knobs (num_iters, patch_size, ...) must plot
            # as ordered categories — numeric hue would give a continuous
            # colormap and a subsampled tick legend
            order = sorted(self.data[groupby].unique())
            self.data = self.data.assign(**{groupby: self.data[groupby].astype(str)})
            if legend_labels is None:
                legend_labels = tuple(str(v) for v in order)
        if legend_labels is None:
            legend_labels = tuple(self.data[groupby].unique())

        if dashed and "extrapolated" in self.data.columns:
            # a grid point is dashed when every group row there is extrapolated
            self.data = pd.concat(
                grp.assign(dashed=grp["extrapolated"].all())
                for _, grp in self.data.groupby([groupby, self.x])
            )
        else:
            self.data["dashed"] = False

        sns.set_theme(style="white")
        fig, ax = plt.subplots()
        sns.lineplot(
            ax=ax,
            data=self.data[~self.data["dashed"]],
            x=self.x,
            y=self.y,
            hue=groupby,
            errorbar=errorbar,
            linestyle="-",
            marker="o",
            markersize=5,
            markeredgewidth=0,
            legend="brief",
        )
        sns.lineplot(
            ax=ax,
            data=self.data,
            x=self.x,
            y=self.y,
            hue=groupby,
            errorbar=None,
            linestyle="--",
            marker="o",
            markersize=5,
            markeredgewidth=0,
            legend=False,
        )
        ax.grid()
        ax.set_xlim(*xlim)
        ax.set_ylim(*ylim)
        handles, labels = ax.get_legend_handles_labels()
        # matplotlib reports legend labels as strings; groupby values may be
        # numeric (e.g. num_iters) — match on their string form
        pairs = [
            (handles[labels.index(str(lbl))], lbl) for lbl in legend_labels
        ]
        sns.move_legend(
            ax, "lower right", handles=[p[0] for p in pairs], labels=[p[1] for p in pairs]
        )
        self.fig, self.ax = fig, ax
        return fig, ax

    def save(self, save_dir: str = ".", prefix: str = "", format: str = "pdf") -> None:
        os.makedirs(save_dir, exist_ok=True)
        metric_name = re.sub(r"\s*\(.*?\)\s*", "", self.y).replace(" ", "_")
        self.fig.savefig(
            os.path.join(save_dir, f"{prefix}_{metric_name}.{format}".lower()),
            bbox_inches="tight",
            pad_inches=0,
        )
