"""QMF color-space ablation: RGB vs YCbCr + 4:2:0.

Same grids as the reference (`experiments/ablation_colorspace/eval.py:51-84`
in pashtari/lrf): RGB quality linspace(0, 10, 50), YCbCr linspace(0, 40, 80).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from common import default_argparser, run_over_dataset, sweep_qmf  # noqa: E402 (adds the repo root to sys.path)

import lrf_tpu
from lrf_tpu.utils.eval import eval_compression


def eval_image(image, image_id):
    results = []
    for quality in np.linspace(0.0, 10, 50):
        params = {
            "color_space": "RGB",
            "quality": float(quality),
            "patch": True,
            "patch_size": (8, 8),
            "bounds": (-16, 15),
            "dtype": np.int8,
            "num_iters": 10,
        }
        log = eval_compression(image, lrf_tpu.qmf_encode, lrf_tpu.qmf_decode, **params)
        results.append({"data": image_id, "method": "QMF", **params, **log})
    results.extend(sweep_qmf(image, image_id))
    return results


if __name__ == "__main__":
    args = default_argparser("QMF color-space ablation.", "ablation_colorspace")
    run_over_dataset(args.data_dir, eval_image, args.save_dir, args.prefix)
