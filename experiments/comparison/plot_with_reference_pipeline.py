"""Render our sweep JSON with the REFERENCE's own plotting pipeline.

The reference's `experiments/comparison/plot.py` hardcodes its repo-relative
paths (and writes into its read-only paper tree), so it cannot run verbatim
here — but the pipeline it drives is `lrf.read_config` -> `lrf.Plot`
(`lrf/utils/misc.py:415-578`). This script executes that exact pipeline,
classes and parameters unchanged, over OUR results JSON: if our rows were
schema- or semantics-incompatible, the reference code would fail or draw
garbage. Output: `{prefix}_psnr_refpipeline.pdf` (+ ssim).

Usage: python plot_with_reference_pipeline.py --results local7_results.json
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _import_reference():
    tests_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "tests",
    )
    sys.path.insert(0, tests_dir)
    from conftest import REFERENCE_PATH, _install_reference_stubs

    _install_reference_stubs()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import lrf

    return lrf


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--results", required=True)
    parser.add_argument("--save_dir", default=os.path.dirname(os.path.abspath(__file__)))
    parser.add_argument("--prefix", default=None)
    args = parser.parse_args()
    prefix = args.prefix or (
        os.path.basename(args.results).replace("_results.json", "")
        + "_refpipeline"
    )

    import matplotlib

    matplotlib.use("Agg")
    import pandas as pd

    lrf = _import_reference()

    # ---- verbatim reference pipeline (plot.py:14-41), paths parameterized
    results = lrf.read_config(args.results)
    results = pd.DataFrame(results)
    results = results.query("`bit rate (bpp)` < 0.8")

    for metric in ("PSNR (dB)", "SSIM"):
        plot = lrf.Plot(
            results, columns=("data", "method", "bit rate (bpp)", metric)
        )
        plot.interpolate(
            x="bit rate (bpp)",
            y=metric,
            x_values=np.linspace(0.05, 0.5, 19),
            groupby=["method", "data"],
        )
        plot.plot(
            x="bit rate (bpp)",
            y=metric,
            groupby="method",
            errorbar="se",
            dashed=True,
            xlim=(0.05, 0.5),
            ylim=(None, None),
            legend_labels=["JPEG", "SVD", "QMF"],
        )
        plot.save(save_dir=args.save_dir, prefix=prefix, format="pdf")
        print(f"reference pipeline rendered {metric} for {len(results)} rows")


if __name__ == "__main__":
    main()
