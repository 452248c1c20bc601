#!/bin/bash
# Cull reconstructed meshes with GT poses + dataset depths, then evaluate
# (parity with reference tools/mesh_cull_gt.sh workflow).
# Usage: scripts/mesh_cull_gt.sh <config.yaml> <exp_dir> <gt_mesh.ply>
set -e
CFG=$1; EXP=$2; GT=$3
python -m remixfusion_tpu.tools.cull_mesh --config "$CFG" \
    --input_mesh "$EXP/mesh.ply" --output_mesh "$EXP/mesh_cull_gt.ply" \
    --poses "$EXP/all_poses.npy" --gt_depth --skip 5
python -m remixfusion_tpu.tools.eval_recon \
    --rec_mesh "$EXP/mesh_cull_gt.ply" --gt_mesh "$GT"
