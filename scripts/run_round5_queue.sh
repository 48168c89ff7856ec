#!/usr/bin/env bash
# Round-5 TPU training queue (VERDICT r4 items #3 #4 #5 #6 #8 #9):
#   A. JAX ConvGRU parity twin train + eval (vs scripts/torch_parity_convgru.py)
#   B. S3VAE full + ablation retrain, then disentangle v2 (judge swaps +
#      latent probes — the content axis measured in latent space)
#   C. Dreamer long-horizon lever: train_seq 50 (2.5x the r4 window) at the
#      r4 capacity recipe, eval 10->10 and 20->180
#   D. CATER classifier trained 5x longer (10k steps)
#   E. VidODE slot-attention convergence run
#   F. nru2 two-pass memory convergence smoke
set -u
cd "$(dirname "$0")/.."
OUT=results/round5
mkdir -p "$OUT/logs"

run() {
  local name="$1" tmo="$2"; shift 2
  echo "=== $(date +%H:%M:%S) ${name}: $*" | tee -a "$OUT/logs/queue.log"
  timeout "$tmo" "$@" >>"$OUT/logs/${name}.log" 2>&1
  echo "=== $(date +%H:%M:%S) ${name}: exit $?" | tee -a "$OUT/logs/queue.log"
}

# --- A. ConvGRU parity (JAX side; torch side already trained) ---------------
run parity_cgru_train 3600 python main.py --configs defaults \
  train_mmnist_cgru_len20 --id parity_cgru_jax --ckpt_id parity_cgru_jax \
  --frozen True --data_dir datasets/parity --batch_size 4 --lr 1.0e-4 \
  --steps_per_epoch 500 --epochs 4 --ckpt_save_freq 2000 --loss_log_freq 250
run parity_cgru_eval 3600 python scripts/jax_parity_eval.py \
  --data datasets/parity --ckpt_id parity_cgru_jax --model ConvGRU \
  --eval_outs 10,190 --eval_videos 64 --out logs/parity/jax_convgru

# --- B. S3VAE disentangle v2 ------------------------------------------------
run s3vae_full_train 7200 python main.py --configs defaults \
  train_mmnist_recon_s3vae --id S3VAE_r5_full --ckpt_id s3vae_r5_full \
  --num_digits 1 --num_sprites 16 --steps_per_epoch 500 --epochs 10 \
  --ckpt_save_freq 5000 --loss_log_freq 250
run s3vae_abl_train 7200 python main.py --configs defaults \
  train_mmnist_recon_s3vae --id S3VAE_r5_ablation --ckpt_id s3vae_r5_ablation \
  --l1 0 --l2 0 --l3 0 --num_digits 1 --num_sprites 16 \
  --steps_per_epoch 500 --epochs 10 --ckpt_save_freq 5000 --loss_log_freq 250
run s3vae_disentangle_v2 5400 python scripts/mmnist_disentangle.py \
  --ckpt_full s3vae_r5_full --ckpt_abl s3vae_r5_ablation \
  --out "$OUT/s3vae_disentangle_v2.json"

# --- E/F first (short) so early results land even if C/D run long -----------
run vidode_slots_train 5400 python main.py --configs defaults \
  train_mmnist_vidode_slots --steps_per_epoch 500 --epochs 4 \
  --batch_size 16 --ckpt_save_freq 2000 --loss_log_freq 250
run odecgru_nru2_train 3600 python main.py --configs defaults \
  train_mmnist_odecgrumem2_len20_1ch --id ODEConv_nru2_r5 \
  --steps_per_epoch 500 --epochs 2 --batch_size 16 \
  --ckpt_save_freq 1000 --loss_log_freq 100

# --- D. CATER 5x longer ------------------------------------------------------
run cater_train 10800 python main.py --configs defaults \
  train_cater_classifier --id CATER_r5 --ckpt_id cater_r5 \
  --data_dir datasets/cater_synth_r5 --cater_train 600 --cater_val 150 \
  --steps_per_epoch 500 --epochs 20 --ckpt_save_freq 5000 \
  --loss_log_freq 250

# --- C. Dreamer long-horizon lever: 50-frame training windows ---------------
run dreamer_len50_train 21600 python main.py --configs defaults \
  train_mmnist_dreamer_discrete --id Dreamer_r5_len50 \
  --ckpt_id dreamer_r5_len50 --cnn_depth 48 --dyn_deter 600 \
  --dyn_hidden 600 --train_seq 50 --train_in_seq 25 --train_out_seq 25 \
  --steps_per_epoch 500 --epochs 300 --ckpt_save_freq 5000 \
  --loss_log_freq 500
run dreamer_len50_eval1010 1800 python main.py --configs defaults \
  train_mmnist_dreamer_discrete --phase test --load_model True \
  --ckpt_id dreamer_r5_len50 --id Dreamer_r5_len50_eval1010 \
  --cnn_depth 48 --dyn_deter 600 --dyn_hidden 600 \
  --eval_batches 16 --test_seq 20 --test_in_seq 10 --test_out_seq 10
run dreamer_len50_eval20180 2700 python main.py --configs defaults \
  train_mmnist_dreamer_discrete --phase test --load_model True \
  --ckpt_id dreamer_r5_len50 --id Dreamer_r5_len50_eval20180 \
  --cnn_depth 48 --dyn_deter 600 --dyn_hidden 600 \
  --eval_batches 8 --test_seq 200 --test_in_seq 20 --test_out_seq 180

echo "=== round5 queue done" | tee -a "$OUT/logs/queue.log"
