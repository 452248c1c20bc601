#!/usr/bin/env bash
# Fetch the three TUM RGB-D sequences used by configs/Tum/*.yaml
# (fr1_desk, fr2_xyz, fr3_office). Reference parity: scripts/download_tum.sh.
# After download: scripts/run_real.sh configs/Tum/tum.yaml data/TUM/<sequence>
#
# NOTE: written for machines with network access; this build environment has
# none, so the script is untested here — the TUM on-disk layout it produces
# is exercised end-to-end by scripts/smoke_real_layout.py instead.
set -euo pipefail

DEST="${1:-data/TUM}"
mkdir -p "$DEST"
cd "$DEST"
for url in \
  https://vision.in.tum.de/rgbd/dataset/freiburg1/rgbd_dataset_freiburg1_desk.tgz \
  https://vision.in.tum.de/rgbd/dataset/freiburg2/rgbd_dataset_freiburg2_xyz.tgz \
  https://vision.in.tum.de/rgbd/dataset/freiburg3/rgbd_dataset_freiburg3_long_office_household.tgz
do
  f="$(basename "$url")"
  wget -c "$url"
  tar -xzf "$f"
  rm -f "$f"
done
echo "TUM sequences under $(pwd); run e.g.:"
echo "  scripts/run_real.sh configs/Tum/tum.yaml $(pwd)/rgbd_dataset_freiburg1_desk"
