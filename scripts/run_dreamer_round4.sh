#!/usr/bin/env bash
# Round-4 VERDICT item #1: decompose and fix Dreamer world-model training.
#
# Phase A — recipe sweep (2k steps each, decomposed loss terms logged every
# 100 steps to metrics.jsonl) + a 10->10 open-loop eval per recipe:
#   gauss_ref   reference-exact MMNIST recipe (Gaussian stoch=50,
#               std_act sigmoid2, gru_layer_norm; dreamerv2/configs.yaml
#               moving_mnist + defaults)
#   discrete    round-3 zoo recipe (discrete 32x32 latents)
#   gauss_free0 kl_free 0.0 (free bits off)
#   gauss_kl01  kl_scale 0.1 (weak KL)
# Phase B — scripts/select_dreamer_round4.py picks the best eval SSIM and
# launches a 25k-step run of that recipe + 10->10 and 20->180 evals.
set -u
cd "$(dirname "$0")/.."
OUT=results/round4
mkdir -p "$OUT/logs" "$OUT/dreamer"

run() {
  local name="$1" tmo="$2"; shift 2
  echo "=== ${name}: $*" | tee -a "$OUT/logs/dreamer_driver.log"
  timeout "$tmo" "$@" >>"$OUT/logs/${name}.log" 2>&1
  echo "=== ${name}: exit $?" | tee -a "$OUT/logs/dreamer_driver.log"
}

sweep() {
  local tag="$1" block="$2"; shift 2
  run "dreamer_${tag}_train" 5400 python main.py --configs defaults "$block" \
    --id "Dreamer_r4_${tag}" --ckpt_id "dreamer_r4_${tag}" \
    --steps_per_epoch 500 --epochs 4 --ckpt_save_freq 2000 \
    --loss_log_freq 100 "$@"
  run "dreamer_${tag}_eval" 2400 python main.py --configs defaults "$block" \
    --phase test --load_model True --ckpt_id "dreamer_r4_${tag}" \
    --id "Dreamer_r4_${tag}_eval1010" --eval_batches 8 \
    --test_seq 20 --test_in_seq 10 --test_out_seq 10
}

sweep gauss_ref   train_mmnist_dreamer
sweep discrete    train_mmnist_dreamer_discrete
sweep gauss_free0 train_mmnist_dreamer --kl_free 0.0
sweep gauss_kl01  train_mmnist_dreamer --kl_scale 0.1

python scripts/select_dreamer_round4.py --phase summarize \
  | tee -a "$OUT/logs/dreamer_driver.log"

# Phase B: long run of the selected recipe.
BEST=$(python scripts/select_dreamer_round4.py --phase best)
echo "=== phase B recipe: $BEST" | tee -a "$OUT/logs/dreamer_driver.log"
# $BEST expands to "<block> [extra flags...]" chosen by the selector.
run dreamer_deep25k_train 23400 python main.py --configs defaults $BEST \
  --id Dreamer_r4_deep25k --ckpt_id dreamer_r4_deep25k \
  --steps_per_epoch 500 --epochs 50 --ckpt_save_freq 5000 --loss_log_freq 250
run dreamer_deep25k_eval1010 2400 python main.py --configs defaults train_mmnist_dreamer \
  --phase test --load_model True --ckpt_id dreamer_r4_deep25k \
  --id Dreamer_r4_deep25k_eval1010 --eval_batches 8 \
  --test_seq 20 --test_in_seq 10 --test_out_seq 10
run dreamer_deep25k_eval20180 3600 python main.py --configs defaults train_mmnist_dreamer \
  --phase test --load_model True --ckpt_id dreamer_r4_deep25k \
  --id Dreamer_r4_deep25k_eval20180 --eval_batches 8 \
  --test_seq 200 --test_in_seq 20 --test_out_seq 180

python scripts/select_dreamer_round4.py --phase final \
  | tee -a "$OUT/logs/dreamer_driver.log"
echo "=== dreamer round4 queue done" | tee -a "$OUT/logs/dreamer_driver.log"
