#!/usr/bin/env bash
# Round-4 follow-up queue:
#   1. Re-run ALL benches with the fixed sync methodology — the axon
#      backend's block_until_ready returns at dispatch, not completion
#      (scripts/bench_timing_probe.py), so the first bench pass timed
#      dispatch, not compute; bench.py now closes every timed window
#      with a host readback of the step's loss.
#   2. Re-run the two main-queue jobs that failed (flownet2_train hit a
#      transient TPU-tunnel broken pipe; s3vae_disentangle hit the
#      checkpoint-restore structure bug, fixed in mmnist_disentangle.py).
#   3. Hand the chip to Dreamer phase C (100k-step large-RSSM run).
set -u
cd "$(dirname "$0")/.."
OUT=results/round4
mkdir -p "$OUT/logs"

# Wait for the main round-4 queue to release the chip.
if [ -f /tmp/r4_queue.pid ]; then
  while kill -0 "$(cat /tmp/r4_queue.pid)" 2>/dev/null; do sleep 30; done
fi
echo "=== chip free; round-4b queue" | tee -a "$OUT/logs/queue_4b.log"

run() {
  local name="$1" tmo="$2"; shift 2
  echo "=== ${name}: $*" | tee -a "$OUT/logs/queue_4b.log"
  timeout "$tmo" "$@" >>"$OUT/logs/${name}.log" 2>&1
  echo "=== ${name}: exit $?" | tee -a "$OUT/logs/queue_4b.log"
}

run bench_flagship_fixed 2400 python bench.py
for fam in s3vae vidode_gan dreamer convlstm flownetc; do
  run "bench_${fam}_fixed" 2400 python bench.py --model "$fam"
done
python - <<'EOF'
import json, pathlib
out = pathlib.Path("results/round4")
rows = []
for fam in ["flagship", "s3vae", "vidode_gan", "dreamer", "convlstm",
            "flownetc"]:
    log = out / f"logs/bench_{fam}_fixed.log"
    if not log.exists():
        continue
    for line in log.read_text().splitlines():
        line = line.strip()
        if line.startswith("{") and "frames_per_sec" in line:
            rows.append(json.loads(line))
(out / "bench_families.json").write_text(json.dumps(rows, indent=2) + "\n")
print(f"bench table -> {out/'bench_families.json'} ({len(rows)} rows)")
EOF

run flownet2_train 5400 python scripts/train_flownetc.py --net 2 \
  --steps 3000 --report "$OUT/flownet2.json"

run s3vae_disentangle 3600 python scripts/mmnist_disentangle.py \
  --ckpt_full s3vae_r4_full --ckpt_abl s3vae_r4_ablation \
  --out "$OUT/s3vae_disentangle.json"

bash scripts/run_dreamer_phasec.sh
echo "=== round-4b queue done" | tee -a "$OUT/logs/queue_4b.log"
