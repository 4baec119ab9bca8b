"""Generic ablation RD plot: group by a chosen parameter column.

Counterpart of the reference's per-ablation `plot.py` scripts: LOESS RD
curves grouped by the ablated knob (e.g. ``--groupby bounds``).

Usage: python ablation_plot.py --results ablation_bounds/kodak_results.json --groupby bounds
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lrf_tpu.utils.config import read_config
from lrf_tpu.utils.plotting import Plot


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--results", type=str, required=True)
    parser.add_argument("--groupby", type=str, required=True)
    parser.add_argument("--metric", type=str, default="PSNR (dB)")
    parser.add_argument("--save_dir", type=str, default=".")
    parser.add_argument("--prefix", type=str, default="ablation")
    args = parser.parse_args()

    rows = read_config(args.results)
    for row in rows:  # stringify list-typed knobs (e.g. bounds) for grouping
        if isinstance(row.get(args.groupby), list):
            row[args.groupby] = str(tuple(row[args.groupby]))

    plot = Plot(rows)
    plot.interpolate(
        x="bit rate (bpp)",
        y=args.metric,
        x_values=np.linspace(0.05, 0.5, 19),
        groupby=("data", args.groupby),
    )
    plot.plot(x="bit rate (bpp)", y=args.metric, groupby=args.groupby, xlim=(0.05, 0.5))
    plot.save(save_dir=args.save_dir, prefix=args.prefix)


if __name__ == "__main__":
    main()
