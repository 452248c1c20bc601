#!/bin/bash
# Rendering-quality evaluation from a checkpoint (PSNR/SSIM/LPIPS/D-L1).
# Usage: scripts/rendering.sh <config.yaml> [gap]
set -e
python rendering_eval.py --config "$1" --gap "${2:-10}"
