#!/bin/bash
# 3D reconstruction metrics for an (already culled) mesh against GT.
# Usage: scripts/mesh_eval.sh <rec_mesh.ply> <gt_mesh.ply> [com_th]
set -e
python -m remixfusion_tpu.tools.eval_recon \
    --rec_mesh "$1" --gt_mesh "$2" --com_th "${3:-0.05}"
