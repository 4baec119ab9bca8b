"""QMF num_iters ablation: K in {0, 1, 2, 5, 10}.

Same grid as the reference (`experiments/ablation_numiters/eval.py:51` in
pashtari/lrf); K >= 5 is near-converged.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from common import default_argparser, run_over_dataset, sweep_qmf


def eval_image(image, image_id):
    results = []
    for num_iters in [0, 1, 2, 5, 10]:
        results.extend(sweep_qmf(image, image_id, num_iters=num_iters))
    return results


if __name__ == "__main__":
    args = default_argparser("QMF num_iters ablation.", "ablation_numiters")
    run_over_dataset(args.data_dir, eval_image, args.save_dir, args.prefix)
