#!/bin/bash
# Round-3 phase E: full-budget rerun of the alpha-sweep cell that phase B
# truncated at ~47 epochs under device contention (rcgan @ alpha=0.125).
# Runs alone on the chip after phase D releases it.
cd "$(dirname "$0")/.."
R=${RUNS:-./runs/round3}
mkdir -p $R
mv $R/sweep_rcgan_a0.125.txt $R/sweep_rcgan_a0.125_phaseB_47ep.txt 2>/dev/null || true
mv $R/sweep_rcgan_a0.125 $R/sweep_rcgan_a0.125_phaseB_47ep 2>/dev/null || true

echo "=== mnist/sweep_rcgan_a0.125 full-budget rerun start $(date +%H:%M:%S) ==="
timeout 3600 python mnist_main.py --train --epoch 100 --batch_size 100 \
  --compute_dtype bfloat16 --data_dir ./runs/mnist_matrix/data --recover_epoch 1000 \
  --checkpoint_dir $R/sweep_rcgan_a0.125 \
  --algorithm rcgan --disc_type projection --noestimate_confuse \
  --noaux_classifier --noadd_noise --noconcat_y --spectral_norm --max_norm \
  --alpha 0.125 > $R/sweep_rcgan_a0.125.txt 2>&1
echo "=== exit=$? $(date +%H:%M:%S) ==="
grep -E "EPOCH=(4|49|99),|label recovery" $R/sweep_rcgan_a0.125.txt | tail -4
echo "=== phase E complete $(date +%H:%M:%S) ==="
