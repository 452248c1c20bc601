#!/bin/bash
# Cull with estimated poses + mesh-rendered occlusion depth, then evaluate.
# Usage: scripts/mesh_cull_est.sh <config.yaml> <exp_dir> <gt_mesh.ply>
set -e
CFG=$1; EXP=$2; GT=$3
python -m remixfusion_tpu.tools.cull_mesh --config "$CFG" \
    --input_mesh "$EXP/mesh.ply" --output_mesh "$EXP/mesh_cull_est.ply" \
    --poses "$EXP/all_poses.npy" --skip 5
python -m remixfusion_tpu.tools.eval_recon \
    --rec_mesh "$EXP/mesh_cull_est.ply" --gt_mesh "$GT"
