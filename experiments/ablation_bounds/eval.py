"""QMF bounds ablation: bounds in {(-8,7), (-16,15), (-32,31), (-128,127)}.

Same grid as the reference (`experiments/ablation_bounds/eval.py:51` in
pashtari/lrf); the paper finds (-16, 15) best.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from common import default_argparser, run_over_dataset, sweep_qmf


def eval_image(image, image_id):
    results = []
    for bounds in [(-8, 7), (-16, 15), (-32, 31), (-128, 127)]:
        results.extend(sweep_qmf(image, image_id, bounds=bounds))
    return results


if __name__ == "__main__":
    args = default_argparser("QMF bounds ablation.", "ablation_bounds")
    run_over_dataset(args.data_dir, eval_image, args.save_dir, args.prefix)
