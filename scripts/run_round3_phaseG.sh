#!/bin/bash
# Round-3 phase G: rerun the 64x64 progressive-GAN schedule with the
# projection-CONDITIONAL critic.  The phase-D run used a label-blind
# critic, so the label-conditioned generator had no conditioning signal
# and per-stage gen-label-acc sat at chance (0.10) by construction; the
# critic now carries the same projection head as the main stack
# (models/pggan.py).  Same budget as phase D for a clean A/B.
# Serial on the one TPU chip; run after phase F releases it.
cd "$(dirname "$0")/.."
R=${RUNS:-./runs/round3}
mkdir -p $R

echo "=== pggan64_cond start $(date +%H:%M:%S) ==="
timeout 7000 python -m rcgan_tpu.apps.pggan_app --run_dir $R/pggan64_cond \
  --size 64 --max_stage 4 --dim 128 --z_dim 128 --batch_size 64 \
  --trans_iters 1500 --stab_iters 1500 --train_size 20000 --conditional \
  > $R/pggan64_cond.txt 2>&1
echo "=== pggan64_cond exit=$? $(date +%H:%M:%S) ==="
grep -E "gen_label_acc|accuracy table" $R/pggan64_cond.txt | tail -8
echo "=== phase G complete $(date +%H:%M:%S) ==="
