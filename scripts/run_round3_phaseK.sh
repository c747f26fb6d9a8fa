#!/bin/bash
# Round-3 phase K: MNIST rcgan+y at alpha=0.6 — the one committed-run gap
# in the +y story.  Every archived +y run so far used the reference's
# exact run_rcgany.sh flags (alpha=0.125, noise_alpha=0.3), where the
# alpha_start formula saturates at 1.0 and the annealed re-noising is
# INERT (QUALITY.md matrix notes; mnist/model.py:294-318).  At alpha=0.6
# the same flags give alpha_start ~= 0.46 < 1, so the schedule is ACTIVE:
# extra label noise is injected early and annealed away between
# noise_start and the derived end epoch.  This run demonstrates the
# schedule machinery live, at a noise level where conditioning is
# feasible, comparable against the committed rcgan (0.996) and biased
# (0.596) alpha=0.6 cells.
cd "$(dirname "$0")/.."
R=${RUNS:-./runs/round3}
mkdir -p $R
common="--train --epoch 100 --batch_size 100 --compute_dtype bfloat16 --data_dir $R/data --recover_epoch 1000"

echo "=== rcgany_a0.6 start $(date +%H:%M:%S) ==="
timeout 3000 python mnist_main.py $common --checkpoint_dir $R/rcgany_a0.6 \
  --algorithm rcgan --alpha 0.6 --disc_type projection \
  --noestimate_confuse --noaux_classifier \
  --add_noise --noise_alpha 0.3 --noise_start 30 --noise_end 80 \
  --concat_y --concat_y_layers 1 --spectral_norm --max_norm \
  > $R/rcgany_a0.6.txt 2>&1
echo "=== rcgany_a0.6 exit=$? $(date +%H:%M:%S) ==="
grep -E "EPOCH=(4|49|99),|label recovery" $R/rcgany_a0.6.txt | tail -4
echo "=== phase K complete $(date +%H:%M:%S) ==="
