#!/usr/bin/env bash
# Round-3 KTH deep run: VidODE + GAN on the KTH-layout corpus — the
# reference Vid-ODE's headline configuration (Vid-ODE trains KTH with the
# adversarial objective; our earlier KTH row was 1k steps, L1-only).
# 30 epochs x 200 steps with per-horizon eval sweeps every 5 epochs,
# then a final test-phase 10->30 eval (MSE/PSNR/SSIM/LPIPS).
set -u
cd "$(dirname "$0")/.."
mkdir -p results/round3/logs results/round3/kth_gan

run() {
  local name="$1" tmo="$2"; shift 2
  local log="results/round3/logs/${name}.log"
  echo "=== ${name}: $*" | tee -a results/round3/logs/kth_gan_driver.log
  timeout "$tmo" "$@" >>"$log" 2>&1
  echo "=== ${name}: exit $?" | tee -a results/round3/logs/kth_gan_driver.log
}

run kth_gan_train 10800 python main.py --configs defaults train_kth_vidode \
  --gan True --id VidODE_kth_gan_train --ckpt_id train_kth_vidode_gan \
  --steps_per_epoch 200 --epochs 30 --gan_test_freq_epochs 5 \
  --ckpt_save_freq 2000 --loss_log_freq 200
run kth_gan_eval 2400 python main.py --configs defaults train_kth_vidode \
  --gan True --id VidODE_kth_gan_train --ckpt_id train_kth_vidode_gan \
  --phase test --load_model True --eval_batches 8

# collect artifacts (train-phase dir is keyed 10_10, test-phase 10_30)
for rdir in logs/VidODE/VidODE_kth_gan_train_10_10 \
            logs/VidODE/VidODE_kth_gan_train_10_30; do
  for f in "$rdir"/gan_eval_epoch*.json "$rdir"/per_horizon.json \
           "$rdir"/train_metrics.jsonl "$rdir"/test_epoch*.png; do
    [ -e "$f" ] && cp "$f" "results/round3/kth_gan/kth_gan_$(basename "$f")"
  done
done
echo "=== kth gan queue done" | tee -a results/round3/logs/kth_gan_driver.log
