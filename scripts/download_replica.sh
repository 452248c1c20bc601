#!/usr/bin/env bash
# Fetch the Replica RGB-D sequences (NICE-SLAM packaging) used by
# configs/Replica/*.yaml. Reference parity: scripts/download_replica.sh.
# After download: scripts/run_real.sh configs/Replica/room0.yaml data/Replica/room0
#
# NOTE: written for machines with network access; this build environment has
# none, so the script is untested here — the on-disk layout it produces is
# exercised end-to-end by scripts/smoke_real_layout.py instead.
set -euo pipefail

DEST="${1:-data/Replica}"
mkdir -p "$DEST"
cd "$DEST"
wget -c https://cvg-data.inf.ethz.ch/nice-slam/data/Replica.zip
unzip -o Replica.zip
rm -f Replica.zip
echo "Replica sequences under $(pwd); run e.g.:"
echo "  scripts/run_real.sh configs/Replica/room0.yaml $(pwd)/room0"
