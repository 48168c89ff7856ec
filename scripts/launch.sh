#!/usr/bin/env bash
# Single-experiment launcher (sbatch payload or direct).
# Parity with /root/reference/scripts/launch.sh (device picker + run).
#SBATCH --time=24:00:00
#SBATCH --mem=32G
#SBATCH --cpus-per-task=8
set -euo pipefail
CFG=${1:?usage: launch.sh <config_block>}
cd "$(dirname "$0")/.."
exec python main.py --configs defaults "$CFG"
