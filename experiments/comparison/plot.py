"""RD-curve plots for the comparison sweep.

Reproduces the reference plotting (`experiments/comparison/plot.py` in
pashtari/lrf): LOESS-interpolated PSNR/SSIM/encode-time/decode-time vs bpp
over the 0.05-0.5 bpp grid, per-method curves with stderr bands.

Usage: python plot.py --results comparison/kodak_results.json
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from lrf_tpu.utils.config import read_config
from lrf_tpu.utils.plotting import Plot

METRICS = ["PSNR (dB)", "SSIM", "encoding time (ms)", "decoding time (ms)"]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--results", type=str, required=True)
    parser.add_argument("--save_dir", type=str, default=".")
    parser.add_argument("--prefix", type=str, default="comparison")
    args = parser.parse_args()

    rows = read_config(args.results)
    x_values = np.linspace(0.05, 0.5, 19)
    for metric in METRICS:
        plot = Plot(rows)
        plot.interpolate(x="bit rate (bpp)", y=metric, x_values=x_values)
        plot.plot(
            x="bit rate (bpp)",
            y=metric,
            xlim=(0.05, 0.5),
            legend_labels=("QMF", "JPEG", "SVD"),
        )
        plot.save(save_dir=args.save_dir, prefix=args.prefix)


if __name__ == "__main__":
    main()
