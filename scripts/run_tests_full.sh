#!/usr/bin/env bash
# Full test tier: everything, including @pytest.mark.slow whole-train-step
# compiles (>35 min on this image's CPU). The default `pytest` run is the
# fast tier (<5 min). Usage: scripts/run_tests_full.sh [extra pytest args]
set -eu
cd "$(dirname "$0")/.."
exec python -m pytest tests/ --slow "$@"
