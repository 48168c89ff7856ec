#!/usr/bin/env bash
# Round-3 continuation: training evidence for the model VARIANTS the zoo
# pass didn't cover — the S3VAE encoder family (cgru, cgru_sa, odecgru,
# cgru_rim, rim, rim+sa), the ODEConvGRU mem / z_sample variants, and the
# cgrudecODE hybrid. Each gets a short convergence run (loss curve logged)
# so "variant exists" is backed by "variant trains", matching the bar the
# round-2 VERDICT set for the main families.
#
# Usage: run_variants_round3.sh smoke   -> 2 steps/variant (crash check)
#        run_variants_round3.sh full    -> ~800 steps/variant
set -u
cd "$(dirname "$0")/.."
MODE="${1:-smoke}"
mkdir -p results/round3/logs

if [ "$MODE" = smoke ]; then
  SPE=2; EPOCHS=1; LOGF=1; SUFFIX=_smoke
else
  SPE=200; EPOCHS=4; LOGF=50; SUFFIX=
fi

run() {
  local name="$1"; shift
  local log="results/round3/logs/variant_${name}${SUFFIX}.log"
  echo "=== variant ${name} ($MODE): $*" | tee -a results/round3/logs/variants_driver.log
  timeout 5400 "$@" >"$log" 2>&1
  echo "=== variant ${name}: exit $?" | tee -a results/round3/logs/variants_driver.log
}

COMMON=(--steps_per_epoch "$SPE" --epochs "$EPOCHS" --ckpt_save_freq 100000 --loss_log_freq "$LOGF")

# S3VAE encoder variants (reference modules/S3VAE_ED.py encoder switch)
run s3vae_cgru      python main.py --configs defaults train_mmnist_recon_cs3vae      "${COMMON[@]}"
run s3vae_cgru_sa   python main.py --configs defaults train_mmnist_recon_cs4vae      "${COMMON[@]}"
run s3vae_odecgru   python main.py --configs defaults train_mmnist_s3vae_odecgru     "${COMMON[@]}"
run s3vae_cgru_rim  python main.py --configs defaults train_mmnist_recon_cgrurims3vae "${COMMON[@]}"
run s3vae_rim       python main.py --configs defaults train_mmnist_recon_rims4vae    "${COMMON[@]}"
run s3vae_rim_sa    python main.py --configs defaults train_mmnist_recon_rimconvs4vae "${COMMON[@]}"

# ODEConvGRU variants: mem (stepwise re-anchored solve), z_sample
# (reparameterized z0 — "Not completed" in the reference), and the
# cgrudecODE hybrid (ConvGRU encoder + neural-ODE decode).
run odecgru_mem     python main.py --configs defaults train_mmnist_odecgrumem_len20_1ch "${COMMON[@]}"
run odecgru_sample  python main.py --configs defaults train_mmnist_sample_odecgru       "${COMMON[@]}"
run cgrudecODE      python main.py --configs defaults train_mmnist_cgrudecODE           "${COMMON[@]}"

echo "variants $MODE done" | tee -a results/round3/logs/variants_driver.log
