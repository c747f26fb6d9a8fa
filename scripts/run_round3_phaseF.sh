#!/bin/bash
# Round-3 phase F: third method for the accuracy-vs-alpha sweep figure.
# The paper's headline MNIST figure compares methods across noise levels;
# phases B/D/E covered rcgan and biased at alpha in {0.125,0.3,0.6,0.9}
# (0.6 rows come from the full matrix).  This adds the unbiased
# (importance-reweighted) baseline at the three non-matrix alphas so the
# committed sweep table has rcgan vs unbiased vs biased at every alpha.
# Serial on the one TPU chip; run after phase E releases it.
cd "$(dirname "$0")/.."
R=${RUNS:-./runs/round3}
mkdir -p $R
mcommon="--train --epoch 100 --batch_size 100 --compute_dtype bfloat16 --data_dir ./runs/mnist_matrix/data --recover_epoch 1000"

mrun() { # name args...
  name=$1; shift
  if grep -q "label recovery accuracy" $R/$name.txt 2>/dev/null; then
    echo "=== mnist/$name already complete, skipping ==="
    return
  fi
  echo "=== mnist/$name start $(date +%H:%M:%S) ==="
  timeout 3600 python mnist_main.py $mcommon --checkpoint_dir $R/$name "$@" > $R/$name.txt 2>&1
  echo "=== mnist/$name exit=$? $(date +%H:%M:%S) ==="
  grep -E "EPOCH=(4|49|99),|label recovery" $R/$name.txt | tail -4
}

unbiased_flags="--algorithm unbiased --disc_type projection --noestimate_confuse --noaux_classifier --noadd_noise --noconcat_y --spectral_norm --max_norm"

for a in 0.125 0.3 0.9; do
  mrun sweep_unbiased_a$a $unbiased_flags --alpha $a
done
echo "=== phase F complete $(date +%H:%M:%S) ==="
