#!/bin/bash
# Round-3 phase I: validate the progressive-GAN stage-3 fix (per-block
# pixel-norm; see scripts/debug_pggan_stage3.py and the 402bade commit) on
# the chip, then the full 64x64 conditional schedule.  Run after phase H.
cd "$(dirname "$0")/.."
R=${RUNS:-./runs/round3}
mkdir -p $R

echo "=== debug stage-3 (fixed) start $(date +%H:%M:%S) ==="
timeout 3000 python scripts/debug_pggan_stage3.py --iters 600 --every 100 \
  > $R/debug_pggan_s3_fix.txt 2>&1
echo "=== debug exit=$? ==="
grep -E "^s3" $R/debug_pggan_s3_fix.txt | tail -4

echo "=== pggan64_cond3 start $(date +%H:%M:%S) ==="
timeout 7000 python -m rcgan_tpu.apps.pggan_app --run_dir $R/pggan64_cond3 \
  --size 64 --max_stage 4 --dim 128 --z_dim 128 --batch_size 64 \
  --trans_iters 1500 --stab_iters 1500 --train_size 20000 --conditional \
  > $R/pggan64_cond3.txt 2>&1
echo "=== pggan64_cond3 exit=$? $(date +%H:%M:%S) ==="
grep -E "gen_label_acc|accuracy table" $R/pggan64_cond3.txt | tail -8
echo "=== phase I complete $(date +%H:%M:%S) ==="
