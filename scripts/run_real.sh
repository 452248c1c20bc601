#!/usr/bin/env bash
# One-command reproduction on a real capture.
#
# Usage:  scripts/run_real.sh configs/BS3D/study_example.yaml [datadir]
#
# 1. (optional) overrides data.datadir with $2
# 2. validates the on-disk dataset layout for the config's loader
#    (remixfusion_tpu/tools/check_data.py — tells you exactly which
#    files/dirs are missing if the download is incomplete)
# 3. runs the online SLAM pipeline
# 4. prints where the outputs landed and how to evaluate them
#
# Expected layouts per dataset family (reference datasets/dataset.py):
#   BS3D/uHumans : datadir/{color/*.jpg|png, depth/*.png, poses.txt}
#                  (uHumans2 raw captures: run
#                   python -m remixfusion_tpu.tools.preprocess first)
#   Replica      : datadir/{results/frame*.jpg, results/depth*.png, traj.txt}
#   FastCaMo     : datadir/{color/*.png, depth/*.png, traj.txt}
#   ScanNet      : datadir/{color/*.jpg, depth/*.png, pose/*.txt}
#   TUM          : datadir/{rgb.txt, depth.txt, groundtruth.txt, rgb/, depth/}
#   Azure/RGB/Realsense : datadir/{color/*.jpg, depth/*.png, pose/*.txt}
#   Largeindoor  : datadir/{color/*.png, depth/*.png, pose/*.txt}
#   iPhone       : datadir/{images/*.png, depth/*.png, odometry.csv}
#
# Every layout above is exercised end-to-end on the TPU by
# scripts/smoke_real_layout.py (analytic frames written in the real
# on-disk format, then the full pipeline through the real loader —
# ATE 0.43-0.85 cm, BASELINE.md).
set -euo pipefail

CFG="${1:?usage: scripts/run_real.sh <config.yaml> [datadir]}"
cd "$(dirname "$0")/.."

EXTRA=()
if [[ $# -ge 2 ]]; then
  EXTRA=(--input_folder "$2")
fi

python -m remixfusion_tpu.tools.check_data --config "$CFG" --strict

python -u run.py --config "$CFG" "${EXTRA[@]}"

OUT=$(python - "$CFG" <<'EOF'
import sys, os
from remixfusion_tpu.config import load_config
c = load_config(sys.argv[1])
print(os.path.join(c["data"]["output"], c["data"]["exp_name"]))
EOF
)
echo
echo "Run complete. Outputs in: $OUT"
echo "  trajectory : $OUT/all_poses.npy  (+ tracking_result.txt)"
echo "  mesh       : $OUT/mesh.ply  (culled: mesh_cull_occlusion.ply)"
echo "Evaluate:"
echo "  ATE  : python -m remixfusion_tpu.tools.eval_ate --est $OUT/all_poses.npy --gt <gt.npy>"
echo "  mesh : python -m remixfusion_tpu.tools.eval_recon --rec_mesh $OUT/mesh_cull_occlusion.ply --gt_mesh <gt.ply>"
