#!/bin/bash
# ATE RMSE between two [N,4,4] .npy pose dumps.
# Usage: scripts/eval_ate.sh <est.npy> <gt.npy>
set -e
python -m remixfusion_tpu.tools.eval_ate --est "$1" --gt "$2"
