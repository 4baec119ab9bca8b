"""Comparison sweep: JPEG vs SVD vs QMF over a dataset.

Same grids as the reference (`experiments/comparison/eval.py:45-116` in
pashtari/lrf): JPEG quality 0..74 step 1, SVD quality linspace(0, 5, 30) on
the RGB+patch path, QMF quality linspace(0, 40, 80) with the canonical
YCbCr/8x8/(-16,15)/int8/10-iters config. Results schema matches the stored
`kodak_results.json` so either plot pipeline can consume them.

Usage: python eval.py --data kodak --data_dir /path/to/kodak
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from common import (
    default_argparser,
    run_over_dataset,
    sweep_jpeg,
    sweep_qmf,
    sweep_svd,
)


def eval_image(image, image_id):
    results = []
    results.extend(sweep_jpeg(image, image_id))
    results.extend(sweep_svd(image, image_id))
    results.extend(sweep_qmf(image, image_id))
    return results


if __name__ == "__main__":
    args = default_argparser("Compare compression methods over a dataset.", "comparison")
    run_over_dataset(args.data_dir, eval_image, args.save_dir, args.prefix)
