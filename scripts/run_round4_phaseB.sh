#!/bin/bash
# Round-4 phase B (VERDICT r3 item 1): demonstrate RCGAN+y — the last
# undemonstrated mode.  3x3 MNIST ablation at the full reference budget
# (100 epochs, batch 100): at alpha in {0.2, 0.25, 0.3}, compare
#   (a) plain rcgan
#   (b) rcgan + --concat_y only (trunk injection, mnist/model.py:651-677)
#   (c) full rcgan+y with an ACTIVE annealing schedule: noise_alpha = alpha/2
#       so alpha_start < 1 (the reference's own run_rcgany flags make the
#       anneal the identity — judge-re-derived in VERDICT r3).
# The app logs rel_alpha + measured label-survival per epoch, proving the
# schedule anneals (mnist_app.py re-noising block).
cd "$(dirname "$0")/.."
R=${RUNS:-./runs/round4/rcgany_ablation}
mkdir -p $R
common="--train --epoch 100 --batch_size 100 --compute_dtype bfloat16 \
  --data_dir $R/data --recover_epoch 1000 --disc_type projection \
  --spectral_norm --max_norm --noestimate_confuse --noaux_classifier \
  --algorithm rcgan"

run() { # name args...
  name=$1; shift
  if [ -f "$R/$name.done" ]; then echo "=== $name already done, skip"; return; fi
  echo "=== $name start $(date +%H:%M:%S) ==="
  timeout 3600 python mnist_main.py $common --checkpoint_dir $R/$name "$@" \
    > $R/$name.txt 2>&1
  rc=$?
  echo "=== $name exit=$rc $(date +%H:%M:%S) ==="
  grep -E "EPOCH=(49|74|99),|label recovery" $R/$name.txt | tail -4
  [ $rc -eq 0 ] && touch $R/$name.done
}

for a in 0.3 0.25 0.2; do
  na=$(python -c "print($a/2)")
  run "rcgan_a${a}"   --alpha $a --noadd_noise --noconcat_y
  run "concaty_a${a}" --alpha $a --noadd_noise --concat_y --concat_y_layers 1
  run "rcgany_a${a}"  --alpha $a --add_noise --noise_alpha $na \
      --noise_start 30 --noise_end 80 --concat_y --concat_y_layers 1
done
echo "=== phase B complete $(date +%H:%M:%S) ==="
