#!/usr/bin/env bash
# Dreamer phase D (round 4): the 100k-step large-RSSM run landed at
# open-loop 10->10 SSIM 0.494 — a hair under the >=0.5 bar — with the
# image-NLL residual still falling (~16 nats over the Gaussian floor at
# 100k vs ~30 at 25k). Continue the same run via auto-resume to 150k
# steps and re-evaluate both horizons.
set -u
cd "$(dirname "$0")/.."
OUT=results/round4
mkdir -p "$OUT/logs"

run() {
  local name="$1" tmo="$2"; shift 2
  echo "=== ${name}: $*" | tee -a "$OUT/logs/queue_phased.log"
  timeout "$tmo" "$@" >>"$OUT/logs/${name}.log" 2>&1
  echo "=== ${name}: exit $?" | tee -a "$OUT/logs/queue_phased.log"
}

run dreamer_big150k_train 10800 python main.py --configs defaults \
  train_mmnist_dreamer_discrete --id Dreamer_r4_big100k \
  --ckpt_id dreamer_r4_big100k --cnn_depth 48 --dyn_deter 600 \
  --dyn_hidden 600 --steps_per_epoch 500 --epochs 300 \
  --ckpt_save_freq 10000 --loss_log_freq 500

run dreamer_big150k_eval1010 1800 python main.py --configs defaults \
  train_mmnist_dreamer_discrete --phase test --load_model True \
  --ckpt_id dreamer_r4_big100k --id Dreamer_r4_big150k_eval1010 \
  --cnn_depth 48 --dyn_deter 600 --dyn_hidden 600 \
  --eval_batches 16 --test_seq 20 --test_in_seq 10 --test_out_seq 10

run dreamer_big150k_eval20180 1800 python main.py --configs defaults \
  train_mmnist_dreamer_discrete --phase test --load_model True \
  --ckpt_id dreamer_r4_big100k --id Dreamer_r4_big150k_eval20180 \
  --cnn_depth 48 --dyn_deter 600 --dyn_hidden 600 \
  --eval_batches 8 --test_seq 200 --test_in_seq 20 --test_out_seq 180

python - <<'EOF'
import json, pathlib, re
out = pathlib.Path("results/round4/dreamer")
report = {}
for tag in ["eval1010", "eval20180"]:
    log = pathlib.Path(f"results/round4/logs/dreamer_big150k_{tag}.log")
    if not log.exists():
        continue
    m = {}
    for line in log.read_text().splitlines():
        for k in ("mse", "psnr", "ssim"):
            mt = re.search(rf"final_{k}=([0-9.eE+-]+)", line)
            if mt:
                m[k] = float(mt.group(1))
    report[tag] = m
tail = []
log = pathlib.Path("results/round4/logs/dreamer_big150k_train.log")
if log.exists():
    for line in log.read_text().splitlines():
        if line.startswith("[step"):
            tail.append(line)
report["loss_tail"] = tail[-8:]
report["recipe"] = ("train_mmnist_dreamer_discrete --cnn_depth 48 "
                    "--dyn_deter 600 --dyn_hidden 600, resumed 100k->150k")
(out / "big150k_summary.json").write_text(json.dumps(report, indent=2) + "\n")
print(json.dumps(report, indent=2))
EOF
echo "=== dreamer phase D done" | tee -a "$OUT/logs/queue_phased.log"
