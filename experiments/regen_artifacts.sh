#!/bin/bash
# Regenerate all CPU sweep artifacts after a codec change (runs sequentially,
# niced; sweeps checkpoint/resume per image). Run it from anywhere:
#   bash experiments/regen_artifacts.sh
# All drivers are invoked from the experiments/ directory so their relative
# default save_dirs ("comparison", "ablation_*") land on the committed
# artifact paths.
set -x
cd "$(dirname "$0")"
export LRF_TPU_PLATFORM=cpu
N="nice -n 15 timeout 7200 python -u"

# 1. local7 comparison, ours (fresh: the QMF rows changed)
rm -f comparison/local7_results.json comparison/comparison/local7_results.json
$N comparison/eval.py --data local7 --data_dir data/local7 --save_dir comparison
$N comparison/aggregate.py \
    --ours comparison/local7_results.json \
    --theirs comparison/local7_reference_results.json \
    --out comparison/local7_aggregate_comparison.json

# 2. kodim01 cross-implementation parity sweep (75 configs, both impls)
$N examples/kodim01_parity.py

# 3. demo comparison sweep + RD plots
rm -f comparison/demo_results.json
$N comparison/eval.py --data demo --data_dir data/demo --save_dir comparison
(cd comparison && $N plot.py --results demo_results.json --prefix demo)

# 4. ablations on the demo images (bounds, num_iters, patch_size, colorspace)
rm -f ablation_bounds/demo_results.json ablation_numiters/demo_results.json \
      ablation_patchsize/demo_results.json ablation_colorspace/demo_results.json
$N ablation_bounds/eval.py --data demo --data_dir data/demo --save_dir ablation_bounds
$N ablation_plot.py --results ablation_bounds/demo_results.json \
    --groupby bounds --save_dir ablation_bounds --prefix demo_bounds
$N ablation_numiters/eval.py --data demo --data_dir data/demo --save_dir ablation_numiters
$N ablation_plot.py --results ablation_numiters/demo_results.json \
    --groupby num_iters --save_dir ablation_numiters --prefix demo_numiters
$N ablation_patchsize/eval.py --data demo --data_dir data/demo --save_dir ablation_patchsize
$N ablation_plot.py --results ablation_patchsize/demo_results.json \
    --groupby patch_size --save_dir ablation_patchsize --prefix demo_patchsize
$N ablation_colorspace/eval.py --data demo --data_dir data/demo --save_dir ablation_colorspace
$N ablation_plot.py --results ablation_colorspace/demo_results.json \
    --groupby color_space --save_dir ablation_colorspace --prefix demo_colorspace

# 5. qualitative collage
(cd examples && $N collage.py)

echo ALL_REGEN_DONE
