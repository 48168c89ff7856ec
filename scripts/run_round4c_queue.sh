#!/usr/bin/env bash
# Round-4 follow-up queue (c): the two 4b jobs that failed, rerun with
# their fixes.
#   1. s3vae_disentangle — the swap-probe decode ran BN in batch-stats
#      mode without declaring the collection mutable
#      (ModifyScopeVariableError); mmnist_disentangle.py now applies with
#      mutable=["batch_stats"] and discards the updates.
#   2. flownet2_train — validate_epe jit closure-captured the 162.5M fp32
#      params, folding ~650 MB of literal constants into the HLO and
#      blowing the remote-compile transport limit (HTTP 413);
#      flow/data.py now passes params as a traced argument. A
#      transient-tunnel retry (the first 4b attempt hit a broken pipe)
#      wraps the run.
set -u
cd "$(dirname "$0")/.."
OUT=results/round4
mkdir -p "$OUT/logs"

# Wait for the 4b queue (dreamer phase C) to release the chip.
if [ -f /tmp/r4b.pid ]; then
  while kill -0 "$(cat /tmp/r4b.pid)" 2>/dev/null; do sleep 60; done
fi
echo "=== chip free; round-4c queue" | tee -a "$OUT/logs/queue_4c.log"

echo "=== s3vae_disentangle (BN-mutable fix)" | tee -a "$OUT/logs/queue_4c.log"
timeout 3600 python scripts/mmnist_disentangle.py \
  --ckpt_full s3vae_r4_full --ckpt_abl s3vae_r4_ablation \
  --out "$OUT/s3vae_disentangle.json" \
  >>"$OUT/logs/s3vae_disentangle.log" 2>&1
echo "=== s3vae_disentangle: exit $?" | tee -a "$OUT/logs/queue_4c.log"

for attempt in 1 2; do
  echo "=== flownet2_train attempt ${attempt}" | tee -a "$OUT/logs/queue_4c.log"
  timeout 7200 python scripts/train_flownetc.py --net 2 --steps 3000 \
    --report "$OUT/flownet2.json" >>"$OUT/logs/flownet2_train.log" 2>&1
  rc=$?
  echo "=== flownet2_train attempt ${attempt}: exit ${rc}" \
    | tee -a "$OUT/logs/queue_4c.log"
  [ "$rc" -eq 0 ] && break
  sleep 60
done
echo "=== round-4c queue done" | tee -a "$OUT/logs/queue_4c.log"
