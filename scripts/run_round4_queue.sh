#!/usr/bin/env bash
# Round-4 serialized TPU queue (runs after the Dreamer sweep/deep queue).
# Covers VERDICT r3 items #2 (S3VAE disentanglement), #3 (per-family
# bench), #4 (FlowNet retrains on the exact-parity architecture + the
# stacked FlowNet2 run), #6 (Vid-ODE dataset-config breadth), #8
# (mp4 -> convert -> train end-to-end).
set -u
cd "$(dirname "$0")/.."
OUT=results/round4
mkdir -p "$OUT/logs" "$OUT/breadth"

# Wait for the Dreamer queue to release the chip.
if [ -f /tmp/dreamer_r4.pid ]; then
  while kill -0 "$(cat /tmp/dreamer_r4.pid)" 2>/dev/null; do sleep 30; done
fi
echo "=== chip free; starting round-4 queue" | tee -a "$OUT/logs/queue.log"

run() {
  local name="$1" tmo="$2"; shift 2
  echo "=== ${name}: $*" | tee -a "$OUT/logs/queue.log"
  timeout "$tmo" "$@" >>"$OUT/logs/${name}.log" 2>&1
  echo "=== ${name}: exit $?" | tee -a "$OUT/logs/queue.log"
}

# --- #4: retrain FlowNetS on the exact-parity architecture (upflow
# biases removed => old msgpack tree is stale) + first stacked-FlowNet2
# training run (fusion path exercised, EPE must beat random init).
run flownets_retrain 1800 python scripts/train_flownetc.py --net S \
  --steps 20000 --report "$OUT/flownets.json"
run flownet2_train 5400 python scripts/train_flownetc.py --net 2 \
  --steps 3000 --report "$OUT/flownet2.json"

# --- #2: S3VAE disentanglement — 4-term vs l1=l2=l3=0 at matched steps
# on 1-digit / 16-sprite MMNIST, then the judge + swap protocol.
run s3vae_full_train 7200 python main.py --configs defaults train_mmnist_recon_s3vae \
  --id S3VAE_r4_full --ckpt_id s3vae_r4_full --num_digits 1 --num_sprites 16 \
  --steps_per_epoch 500 --epochs 10 --ckpt_save_freq 5000 --loss_log_freq 250
run s3vae_abl_train 7200 python main.py --configs defaults train_mmnist_recon_s3vae \
  --id S3VAE_r4_ablation --ckpt_id s3vae_r4_ablation --num_digits 1 --num_sprites 16 \
  --l1 0 --l2 0 --l3 0 \
  --steps_per_epoch 500 --epochs 10 --ckpt_save_freq 5000 --loss_log_freq 250
run s3vae_disentangle 3600 python scripts/mmnist_disentangle.py \
  --ckpt_full s3vae_r4_full --ckpt_abl s3vae_r4_ablation \
  --out "$OUT/s3vae_disentangle.json"

# --- #6: Vid-ODE dataset-config breadth — the five untrained corpora
# (hurricane's 6-channel input is the unique code path). Synthetic
# corpora in each dataset's layout, ~500 steps each, finite decreasing
# loss is the bar.
for ds in mgif penn hurricane phyre minerl; do
  run "corpus_${ds}" 1200 python scripts/make_synthetic_corpus.py \
    --dataset "$ds" --out "/tmp/r4_${ds}" --train_videos 24 --test_videos 6
  run "vidode_${ds}" 3600 python main.py --configs defaults "train_${ds}_vidode" \
    --data_dir "/tmp/r4_${ds}" --id "VidODE_r4_${ds}" --ckpt_id "vidode_r4_${ds}" \
    --steps_per_epoch 100 --epochs 5 --ckpt_save_freq 500 --loss_log_freq 50 \
    --batch_size 4
done

# --- #8: mp4 -> train end-to-end, both ingestion stories:
# (a) direct frozen-mode mp4 decode; (b) convert_mp4_to_npy bridge.
run mp4_make 1200 python scripts/make_mp4_mmnist.py --out /tmp/r4_mp4 \
  --videos 40 --test_videos 8 --frames 60
run mp4_frozen_train 3600 python main.py --configs defaults train_mmnist_cgru_len20 \
  --frozen True --data_dir /tmp/r4_mp4 --id ConvGRU_r4_mp4 --ckpt_id cgru_r4_mp4 \
  --steps_per_epoch 100 --epochs 2 --ckpt_save_freq 200 --loss_log_freq 25
run mp4_convert 1200 python scripts/convert_mp4_to_npy.py --src /tmp/r4_mp4/train \
  --out /tmp/r4_mp4_npy --gray --size 64
run mp4_corpus_train 3600 python main.py --configs defaults train_kth_vidode \
  --data_dir /tmp/r4_mp4_npy --in_channels 1 --id VidODE_r4_mp4corpus \
  --ckpt_id vidode_r4_mp4corpus --steps_per_epoch 100 --epochs 2 \
  --ckpt_save_freq 200 --loss_log_freq 25 --batch_size 4

# --- #3: per-family bench table on the now-free chip.
for fam in s3vae vidode_gan dreamer convlstm flownetc; do
  run "bench_${fam}" 2400 python bench.py --model "$fam"
done
run bench_flagship 2400 python bench.py
python - <<'EOF'
import json, pathlib
out = pathlib.Path("results/round4")
rows = []
for fam in ["flagship", "s3vae", "vidode_gan", "dreamer", "convlstm",
            "flownetc"]:
    log = out / f"logs/bench_{fam}.log"
    if fam == "flagship":
        log = out / "logs/bench_flagship.log"
    if not log.exists():
        continue
    for line in log.read_text().splitlines():
        line = line.strip()
        if line.startswith("{") and "frames_per_sec" in line:
            rows.append(json.loads(line))
(out / "bench_families.json").write_text(
    json.dumps(rows, indent=2) + "\n")
print(f"bench table -> {out/'bench_families.json'} ({len(rows)} rows)")
EOF

echo "=== round-4 queue done" | tee -a "$OUT/logs/queue.log"
