"""QMF patch-size ablation: 4/8/16/32 and no patching.

Same grid as the reference (`experiments/ablation_patchsize/eval.py:49-55`
in pashtari/lrf); 8x8 is best.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from common import default_argparser, run_over_dataset, sweep_qmf


def eval_image(image, image_id):
    results = []
    for patch_size, patch in [(4, True), (8, True), (16, True), (32, True), (None, False)]:
        # the no-patch config must RECORD patch_size=None too, or the
        # groupby merges its rows into the true 8x8 group (the committed
        # round-3 artifact had exactly that corruption)
        overrides = {
            "patch": patch,
            "patch_size": (patch_size, patch_size) if patch else None,
        }
        results.extend(sweep_qmf(image, image_id, **overrides))
    return results


if __name__ == "__main__":
    args = default_argparser("QMF patch-size ablation.", "ablation_patchsize")
    run_over_dataset(args.data_dir, eval_image, args.save_dir, args.prefix)
