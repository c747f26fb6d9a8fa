#!/bin/bash
# MNIST mode matrix at the reference budget (100 epochs), run_*.sh shapes
cd "$(dirname "$0")/.."
R=${RUNS:-./runs/mnist_matrix}
mkdir -p $R
common="--train --epoch 100 --batch_size 100 --compute_dtype bfloat16 --data_dir $R/data --recover_epoch 1000"

run() { # name args...
  name=$1; shift
  echo "=== $name start $(date +%H:%M:%S) ==="
  timeout 3000 python mnist_main.py $common --checkpoint_dir $R/$name "$@" > $R/$name.txt 2>&1
  echo "=== $name exit=$? $(date +%H:%M:%S) ==="
  grep -E "EPOCH=(4|49|99),|label recovery" $R/$name.txt | tail -4
}

run biased   --algorithm biased   --alpha 0.6  --disc_type vanilla --loss_fn ce --real_match --noestimate_confuse --noaux_classifier --noadd_noise --noconcat_y --nospectral_norm --nomax_norm
run unbiased --algorithm unbiased --alpha 0.6  --disc_type projection --noestimate_confuse --noaux_classifier --noadd_noise --noconcat_y --spectral_norm --max_norm
run ambient  --algorithm ambient  --alpha 0.6  --disc_type vanilla --loss_fn ce --real_match --noestimate_confuse --noaux_classifier --noadd_noise --noconcat_y --nospectral_norm --nomax_norm
run rcganu   --algorithm rcgan    --alpha 0.3  --disc_type projection --estimate_confuse --aux_classifier --noadd_noise --noconcat_y --spectral_norm --max_norm
run rcgany   --algorithm rcgan    --alpha 0.125 --disc_type projection --noestimate_confuse --noaux_classifier --add_noise --noise_alpha 0.3 --noise_start 30 --noise_end 80 --concat_y --concat_y_layers 1 --spectral_norm --max_norm
