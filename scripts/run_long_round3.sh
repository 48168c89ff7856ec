#!/usr/bin/env bash
# Round-3 deep-evidence runs (HANDOFF gap #2: "zoo runs prove convergence,
# not final quality"). Two sustained single-chip runs, sequential:
#   1. VidODE+GAN, 100 epochs x 60 steps (reference trained its GAN for
#      hundreds of epochs — this is the stability-over-many-LR-decays run),
#      per-horizon eval sweeps every 10 epochs.
#   2. S3VAE 4-term loss with trained-FlowNetC DFP labels, 50k steps
#      (time-capped; checkpoints every 5k so the eval grades whatever
#      step the cap reached; auto-resume can continue it later).
set -u
cd "$(dirname "$0")/.."
mkdir -p results/round3/logs

run() {
  local name="$1" tmo="$2"; shift 2
  local log="results/round3/logs/${name}.log"
  echo "=== ${name}: $*" | tee -a results/round3/logs/long_driver.log
  timeout "$tmo" "$@" >>"$log" 2>&1
  echo "=== ${name}: exit $?" | tee -a results/round3/logs/long_driver.log
}

run gan_long_train 10800 python main.py --configs defaults train_mmnist_vidode_gan \
  --id VidODE_gan_long_mmnist_train --ckpt_id train_mmnist_vidode_gan_long \
  --steps_per_epoch 60 --epochs 100 --gan_test_freq_epochs 10 \
  --ckpt_save_freq 3000 --loss_log_freq 300
run gan_long_eval 3600 python main.py --configs defaults train_mmnist_vidode_gan \
  --id VidODE_gan_long_mmnist_train --ckpt_id train_mmnist_vidode_gan_long \
  --phase test --load_model True --eval_batches 8

run s3vae_long_train 12600 python main.py --configs defaults train_mmnist_extrap_s3vae \
  --id extrap_s3vae_long_mmnist --ckpt_id train_mmnist_extrap_s3vae_long \
  --flow_label_source flownet --steps_per_epoch 500 --epochs 100 \
  --ckpt_save_freq 5000 --loss_log_freq 250
run s3vae_long_eval 3600 python main.py --configs defaults test_mmnist_extrap_s3vae \
  --id extrap_s3vae_long_mmnist --ckpt_id train_mmnist_extrap_s3vae_long \
  --eval_batches 8

echo "=== long queue done" | tee -a results/round3/logs/long_driver.log
