#!/usr/bin/env bash
# Late-round-3 TPU re-run queue (HANDOFF.md "TPU re-run queue"): the
# parity fixes that landed while the TPU tunnel was wedged (GAN
# seq-discriminator windows + interp mode engaging; reference-exact
# SpatialDreamer skip-gate cell) invalidated the snapshots trained
# before them, and the gitignored logs/ tree (incl. the trained
# FlowNetC params the DFP label path defaults to) did not survive the
# workspace. Re-create all of it on the real chip, sequentially.
set -u
cd "$(dirname "$0")/.."
mkdir -p results/round3/logs logs/flow

run() {
  local name="$1"; shift
  local log="results/round3/logs/${name}.log"
  echo "=== ${name}: $*" | tee -a results/round3/logs/rerun_driver.log
  timeout 5400 "$@" >>"$log" 2>&1
  echo "=== ${name}: exit $?" | tee -a results/round3/logs/rerun_driver.log
}

# --- FlowNetC: regenerate the trained params behind flow_label_source=flownet
run flownetc_retrain python scripts/train_flownetc.py --steps 20000 \
  --report results/round3/flownetc_rerun.json

# --- SpatialDreamer: retrain with the reference-exact per-channel skip-gate
# cell (old checkpoint is param-incompatible with the rewrite)
run spatial_dreamer_train python main.py --configs defaults \
  train_mmnist_dreamer_spatial --steps_per_epoch 200 --epochs 8 \
  --ckpt_save_freq 1600 --loss_log_freq 50
run spatial_dreamer_eval python main.py --configs defaults \
  train_mmnist_dreamer_spatial --phase test --load_model True \
  --eval_batches 8

# --- VidODE + GAN, interp mode (the config default now actually engages
# interp: rearrange_seq_interp windows, reference gan.py parity)
run vidode_gan_interp_train python main.py --configs defaults \
  train_mmnist_vidode_gan --steps_per_epoch 60 --epochs 25 \
  --gan_test_freq_epochs 5 --ckpt_save_freq 1500 --loss_log_freq 60
run vidode_gan_interp_eval python main.py --configs defaults \
  train_mmnist_vidode_gan --phase test --load_model True --eval_batches 8

# --- VidODE + GAN, extrap mode (t_ctx+1-frame seq-D windows, the
# reference's seq_len += 1 semantics fixed post-zoo)
run vidode_gan_extrap_train python main.py --configs defaults \
  train_mmnist_vidode_gan --extrapolate True \
  --id VidODE_gan_extrap_mmnist_train --ckpt_id train_mmnist_vidode_gan_extrap \
  --steps_per_epoch 60 --epochs 25 --gan_test_freq_epochs 5 \
  --ckpt_save_freq 1500 --loss_log_freq 60
run vidode_gan_extrap_eval python main.py --configs defaults \
  train_mmnist_vidode_gan --extrapolate True \
  --id VidODE_gan_extrap_mmnist_train --ckpt_id train_mmnist_vidode_gan_extrap \
  --phase test --load_model True --eval_batches 8

echo "=== rerun queue done" | tee -a results/round3/logs/rerun_driver.log
