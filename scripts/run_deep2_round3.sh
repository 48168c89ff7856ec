#!/usr/bin/env bash
# Round-3 depth pass #2: lengthen the two thinnest zoo rows.
#   - Dreamer world model: 10k steps (zoo stopped at 1.6k with the loss
#     still falling) + per-horizon eval.
#   - CATER classifier: 2000 steps (zoo: 300) + val mAP report, then the
#     eval-only entry re-sweeps the snapshot.
set -u
cd "$(dirname "$0")/.."
mkdir -p results/round3/logs

run() {
  local name="$1" tmo="$2"; shift 2
  local log="results/round3/logs/${name}.log"
  echo "=== ${name}: $*" | tee -a results/round3/logs/deep2_driver.log
  timeout "$tmo" "$@" >>"$log" 2>&1
  echo "=== ${name}: exit $?" | tee -a results/round3/logs/deep2_driver.log
}

run dreamer_deep_train 7200 python main.py --configs defaults train_mmnist_dreamer \
  --id Dreamer_deep_mmnist_train --ckpt_id train_mmnist_dreamer_deep \
  --steps_per_epoch 500 --epochs 20 --ckpt_save_freq 5000 --loss_log_freq 250
run dreamer_deep_eval 3600 python main.py --configs defaults train_mmnist_dreamer \
  --id Dreamer_deep_mmnist_train --ckpt_id train_mmnist_dreamer_deep \
  --phase test --load_model True --eval_batches 8

run cater_deep_train 7200 python main.py --configs defaults train_cater_classifier \
  --id CATER_deep_classifier_train --ckpt_id train_cater_classifier_deep \
  --steps_per_epoch 200 --epochs 10 --ckpt_save_freq 2000 --loss_log_freq 100
run cater_deep_eval 3600 python main.py --configs defaults test_cater_classifier \
  --id CATER_deep_classifier_train --ckpt_id train_cater_classifier_deep

echo "=== deep2 queue done" | tee -a results/round3/logs/deep2_driver.log
