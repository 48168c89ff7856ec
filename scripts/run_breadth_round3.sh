#!/usr/bin/env bash
# Round-3 breadth pass: longer runs + the eval artifacts the zoo table
# lacked — external-corpus VidODE (KTH layout) WITH a test-phase eval,
# irregular-sampling VidODE in both extrap and interp window modes,
# 10k-step S2VAE-family runs, and a 5k DS-VAE with probe grids + the
# disagreement-score protocol.
set -u
cd "$(dirname "$0")/.."
mkdir -p results/round3/logs

run() {
  local name="$1" tmo="$2"; shift 2
  local log="results/round3/logs/${name}.log"
  echo "=== ${name}: $*" | tee -a results/round3/logs/breadth_driver.log
  timeout "$tmo" "$@" >>"$log" 2>&1
  echo "=== ${name}: exit $?" | tee -a results/round3/logs/breadth_driver.log
}

# external-corpus VidODE (synthetic KTH-layout; zero-egress image)
[ -d datasets/kth/train ] || run kth_corpus 1800 python \
  scripts/make_synthetic_corpus.py --dataset kth --out datasets/kth
run kth_vidode_train 7200 python main.py --configs defaults train_kth_vidode \
  --steps_per_epoch 200 --epochs 5 --ckpt_save_freq 1000 --loss_log_freq 100
run kth_vidode_eval 3600 python main.py --configs defaults train_kth_vidode \
  --phase test --load_model True --eval_batches 4

# irregular sampling, extrap + interp window modes
run vidode_irr_extrap_train 7200 python main.py --configs defaults \
  train_mmnist_vidode_irregular --steps_per_epoch 200 --epochs 5 \
  --ckpt_save_freq 1000 --loss_log_freq 100
run vidode_irr_extrap_eval 3600 python main.py --configs defaults \
  train_mmnist_vidode_irregular --phase test --load_model True --eval_batches 4
run vidode_irr_interp_train 7200 python main.py --configs defaults \
  train_mmnist_vidode_irregular --extrapolate False \
  --id VidODE_irr_interp_mmnist_train --ckpt_id train_mmnist_vidode_irr_interp \
  --steps_per_epoch 200 --epochs 5 --ckpt_save_freq 1000 --loss_log_freq 100
run vidode_irr_interp_eval 3600 python main.py --configs defaults \
  train_mmnist_vidode_irregular --extrapolate False \
  --id VidODE_irr_interp_mmnist_train --ckpt_id train_mmnist_vidode_irr_interp \
  --phase test --load_model True --eval_batches 4

# S2VAE family, 10k steps each
for fam in s2vae cs2vae ds2vae; do
  run ${fam}_10k_train 7200 python main.py --configs defaults \
    train_mmnist_${fam} --id ${fam}_10k_mmnist --ckpt_id train_mmnist_${fam}_10k \
    --steps_per_epoch 500 --epochs 20 --ckpt_save_freq 5000 --loss_log_freq 250
  run ${fam}_10k_eval 3600 python main.py --configs defaults \
    test_mmnist_${fam} --id ${fam}_10k_mmnist --ckpt_id train_mmnist_${fam}_10k \
    --eval_batches 8
done

# DS-VAE sprites: 5k steps, probe grids, disagreement-score protocol
run dsvae_5k_train 7200 python main.py --configs defaults train_sprite_dsvae \
  --steps_per_epoch 500 --epochs 10 --ckpt_save_freq 5000 --loss_log_freq 250
run dsvae_probes 3600 python scripts/sprite_probe_grids.py
run dsvae_disagreement 7200 python scripts/sprite_disagreement.py \
  --out results/round3/sprite_disagreement_5k.json

echo "=== breadth queue done" | tee -a results/round3/logs/breadth_driver.log
