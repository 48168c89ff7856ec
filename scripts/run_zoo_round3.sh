#!/usr/bin/env bash
# Round-3 model-zoo convergence runs: one short training run + one eval
# artifact per model family, sequentially (one TPU chip). Each family's
# stdout goes to results/round3/logs/<name>.log; the summary table is
# built afterwards by scripts/summarize_round3.py.
#
# The reference's bar is "research code that was actually used" — these
# runs prove each family's loss *converges* and its eval path produces
# real artifacts, not just that the math unit-tests green.
set -u
cd "$(dirname "$0")/.."
mkdir -p results/round3/logs

run() {
  local name="$1"; shift
  local log="results/round3/logs/${name}.log"
  echo "=== ${name}: $*" | tee -a results/round3/logs/driver.log
  timeout 5400 "$@" >>"$log" 2>&1
  echo "=== ${name}: exit $?" | tee -a results/round3/logs/driver.log
}

# --- S3VAE (4-term loss, DFP labels from the TRAINED FlowNetC) ---------------
run s3vae_train python main.py --configs defaults train_mmnist_extrap_s3vae \
  --flow_label_source flownet --steps_per_epoch 200 --epochs 10 \
  --ckpt_save_freq 2000 --loss_log_freq 50
run s3vae_eval python main.py --configs defaults test_mmnist_extrap_s3vae \
  --eval_batches 8

# --- S2VAE / CS2VAE / DS2VAE (slot-sequential VAE family) --------------------
run s2vae_train python main.py --configs defaults train_mmnist_s2vae \
  --steps_per_epoch 200 --epochs 8 --ckpt_save_freq 1600
run s2vae_eval python main.py --configs defaults test_mmnist_s2vae \
  --eval_batches 8

run cs2vae_train python main.py --configs defaults train_mmnist_cs2vae \
  --steps_per_epoch 200 --epochs 8 --ckpt_save_freq 1600
run cs2vae_eval python main.py --configs defaults test_mmnist_cs2vae \
  --eval_batches 8

run ds2vae_train python main.py --configs defaults train_mmnist_ds2vae \
  --steps_per_epoch 200 --epochs 8 --ckpt_save_freq 1600
run ds2vae_eval python main.py --configs defaults test_mmnist_ds2vae \
  --eval_batches 8

# --- VidODE + GAN (≥20 epochs, periodic eval + image dumps) ------------------
run vidode_gan_train python main.py --configs defaults train_mmnist_vidode_gan \
  --steps_per_epoch 60 --epochs 25 --gan_test_freq_epochs 5 \
  --ckpt_save_freq 1500 --loss_log_freq 60
run vidode_gan_eval python main.py --configs defaults train_mmnist_vidode_gan \
  --phase test --load_model True --eval_batches 8 \
  --test_in_seq 10 --test_out_seq 10

# --- Dreamer world model ------------------------------------------------------
run dreamer_train python main.py --configs defaults train_mmnist_dreamer \
  --steps_per_epoch 200 --epochs 8 --ckpt_save_freq 1600
run dreamer_eval python main.py --configs defaults train_mmnist_dreamer \
  --phase test --load_model True --eval_batches 8 \
  --test_in_seq 10 --test_out_seq 10

# --- ConvLSTM encoder-forecaster ---------------------------------------------
run convlstm_train python main.py --configs defaults train_mmnist_convlstm \
  --steps_per_epoch 200 --epochs 8 --ckpt_save_freq 1600
run convlstm_eval python main.py --configs defaults train_mmnist_convlstm \
  --phase test --load_model True --eval_batches 8 \
  --test_in_seq 10 --test_out_seq 10

# --- DS-VAE on sprites (probe grids as the eval artifact) --------------------
run dsvae_train python main.py --configs defaults train_sprite_dsvae \
  --steps_per_epoch 200 --epochs 8 --ckpt_save_freq 1600
run dsvae_probes python scripts/sprite_probe_grids.py

# --- FlowNetS (FlowNetC runs via scripts/train_flownetc.py) ------------------
run flownets_train python - <<'EOF'
import json, pathlib, time
from ode_rl_tpu.flow.flownets import FlowNetS
from ode_rl_tpu.flow.train import train_flownet
t0 = time.time()
out = train_flownet(FlowNetS(), steps=1000, batch=8, pair_input=True)
rep = {"steps": 1000, "final_train_loss": out["loss"],
       "final_train_epe": out["epe"], "train_seconds": round(time.time()-t0, 1)}
p = pathlib.Path("results/round3/flownets.json")
p.write_text(json.dumps(rep, indent=2))
print("flownets:", rep)
EOF

echo "zoo done" | tee -a results/round3/logs/driver.log
