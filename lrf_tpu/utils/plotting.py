"""LOESS smoothing and rate-distortion plotting.

Re-implements the reference's RD-curve pipeline (`lrf/utils/misc.py:276-578`
in pashtari/lrf), which defines how its published curves are produced:

- `LOESS`: locally-weighted polynomial regression with tricube weights over
  the k = ceil(frac * n) nearest neighbours, polynomial degree 1/2 via a
  Vandermonde design matrix, and leave-one-out cross-validated grid search
  over (frac, degree).
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


class LOESS:
    """Locally-weighted polynomial regression (`lrf/utils/misc.py:276`)."""

    def __init__(self, frac=0.3, degree=1) -> None:
        self.frac = np.atleast_1d(frac)
        self.degree = np.atleast_1d(degree)
        self.x: Optional[np.ndarray] = None
        self.y: Optional[np.ndarray] = None
        self.best_frac: Optional[float] = None
        self.best_degree: Optional[int] = None

    @staticmethod
    def _tricube(d: np.ndarray) -> np.ndarray:
        return np.clip((1.0 - d**3) ** 3, 0.0, 1.0)

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
        n = len(self.x)
        errors = np.empty(n)
        for i in range(n):
            model = LOESS(frac=frac, degree=degree)
            model.fit(np.delete(self.x, i), np.delete(self.y, i))
            errors[i] = (self.y[i] - model.predict([self.x[i]])[0]) ** 2
        return float(np.mean(errors))

    def predict(self, x_new) -> np.ndarray:
        from scipy.linalg import lstsq

        x_new = np.asarray(x_new, dtype=float)
        n = len(self.x)
        k = int(np.ceil(self.best_frac * n))
        out = np.empty_like(x_new)
        for i, xq in enumerate(x_new):
            distances = np.abs(self.x - xq)
            idx = np.argsort(distances)[:k]
            span = distances[idx][-1]
            weights = self._tricube(distances[idx] / span) if span > 0 else np.ones(k)
            w = np.diag(weights)
            design = np.vander(self.x[idx], int(self.best_degree) + 1)
            beta = lstsq(w @ design, w @ self.y[idx], cond=None)[0]
            out[i] = np.polyval(beta, xq)
        return out


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
        pairs = [(handles[labels.index(lbl)], lbl) for lbl in legend_labels]
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
