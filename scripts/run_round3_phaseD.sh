#!/bin/bash
# Round-3 phase D: the accuracy-vs-alpha sweep cells that phase B did not
# reach before the previous session's cutoff (rcgan@0.125 completed there),
# plus the PGGAN 64x64 progressive run.  Serial on the one TPU chip; run
# after phase C releases the device.
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

rcgan_flags="--algorithm rcgan --disc_type projection --noestimate_confuse --noaux_classifier --noadd_noise --noconcat_y --spectral_norm --max_norm"
biased_flags="--algorithm biased --disc_type vanilla --loss_fn ce --real_match --noestimate_confuse --noaux_classifier --noadd_noise --noconcat_y --nospectral_norm --nomax_norm"

for a in 0.6 0.9; do
  mrun sweep_rcgan_a$a $rcgan_flags --alpha $a
done
for a in 0.125 0.3 0.9; do
  mrun sweep_biased_a$a $biased_flags --alpha $a
done

echo "=== pggan64 start $(date +%H:%M:%S) ==="
timeout 7000 python -m rcgan_tpu.apps.pggan_app --run_dir $R/pggan64 \
  --size 64 --max_stage 4 --dim 128 --z_dim 128 --batch_size 64 \
  --trans_iters 1500 --stab_iters 1500 --train_size 20000 \
  > $R/pggan64.txt 2>&1
echo "=== pggan64 exit=$? $(date +%H:%M:%S) ==="
grep -E "gen_label_acc|accuracy table" $R/pggan64.txt | tail -8
echo "=== phase D complete $(date +%H:%M:%S) ==="
