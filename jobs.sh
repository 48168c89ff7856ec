#!/usr/bin/env bash
# Experiment launcher with dependency chaining.
#
# Capability parity with the reference's SLURM launcher layer
# (/root/reference/jobs.sh, script_runners/*.sh: sbatch submission with
# --dependency=afterok chaining and job-id logging to out/job_logs.txt).
# On a SLURM cluster this submits sbatch jobs; elsewhere it runs the
# configs sequentially (same chaining semantics: stop on failure).
#
#   ./jobs.sh <exp_config> [<exp_config> ...]
#   e.g. ./jobs.sh train_mmnist_odecgru_len20_1ch test_mmnist_odecgru_len20_1ch
set -euo pipefail

mkdir -p out
LOG=out/job_logs.txt

if command -v sbatch >/dev/null 2>&1; then
    PREV=""
    for CFG in "$@"; do
        DEP=""
        [ -n "$PREV" ] && DEP="--dependency=afterok:$PREV"
        JID=$(sbatch --parsable $DEP scripts/launch.sh "$CFG")
        echo "$(date +%F_%T) $JID $CFG" >> "$LOG"
        echo "submitted $CFG as job $JID (dep: ${PREV:-none})"
        PREV=$JID
    done
else
    for CFG in "$@"; do
        echo "$(date +%F_%T) local $CFG" >> "$LOG"
        echo "=== running $CFG ==="
        python main.py --configs defaults "$CFG"
    done
fi
