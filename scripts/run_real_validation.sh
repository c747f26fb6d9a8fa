#!/bin/bash
# One-command real-data validation (VERDICT r3 item 7).
#
# Given a data directory containing the real datasets and scorer weights:
#   $DATA_DIR/mnist/{train,t10k}-{images-idx3,labels-idx1}-ubyte   (idx files)
#   $DATA_DIR/cifar10/cifar-10-batches-py/{data_batch_1..5,test_batch}
#   $DATA_DIR/cifar10/inception_v3.npz                             (scorer)
# this script runs, in order:
#   1. Inception-scorer calibration against the reference's real-CIFAR
#      anchor 11.31 +/- 0.08 (inception_score_.py:82)
#   2. The full 10-config reference run matrix (6 MNIST modes + 4 CIFAR
#      modes) at the reference budgets
#   3. The accuracy-vs-alpha sweep figure from the finished runs
#
# Usage:
#   DATA_DIR=/path/to/data ./scripts/run_real_validation.sh
#   SMOKE=1 ./scripts/run_real_validation.sh     # minutes-long synthetic smoke
#
# Without real files every step still runs end-to-end on the synthetic
# stand-in (each step prints its own SYNTHETIC warning), which is how this
# script is smoke-tested on a zero-egress box; results on synthetic data
# are NOT comparable to the paper's.
#
# Expected artifacts under $OUT (default ./runs/real_validation):
#   calibration.txt                        scorer anchor (compare to 11.31)
#   mnist_{biased,unbiased,ambient,rcgan,rcganu,rcgany}/   run dirs:
#       run.log, config.json, samples/, ckpt/, gen_label_acc.jpg,
#       recovery.txt (+ c_recovery_tv*.jpg for rcganu)
#   cifar_{biased,unbiased,rcgan,rcganu}/  run dirs:
#       log, samples_*.png, inception_50k.jpg, gen_label_acc.jpg
#   sweep/mnist_alpha_sweep.png            (only if sweep cells exist)
set -u
cd "$(dirname "$0")/.."

DATA_DIR=${DATA_DIR:-./runs/real_validation/data}
OUT=${OUT:-./runs/real_validation}
mkdir -p "$OUT" "$DATA_DIR"

if [ -n "${SMOKE:-}" ]; then
  MNIST_EPOCHS=2; CIFAR_ITERS=60; RECOVER=50; CAL_N=2000
  echo "### SMOKE mode: tiny budgets, synthetic fallback allowed"
else
  MNIST_EPOCHS=100; CIFAR_ITERS=50000; RECOVER=1000; CAL_N=50000
fi

have_mnist=1
for f in train-images-idx3-ubyte train-labels-idx1-ubyte \
         t10k-images-idx3-ubyte t10k-labels-idx1-ubyte; do
  [ -f "$DATA_DIR/mnist/$f" ] || have_mnist=0
done
have_cifar=1
for f in data_batch_1 data_batch_2 data_batch_3 data_batch_4 data_batch_5 test_batch; do
  [ -f "$DATA_DIR/cifar10/cifar-10-batches-py/$f" ] || have_cifar=0
done
if [ "$have_mnist" = 0 ] || [ "$have_cifar" = 0 ]; then
  echo "##############################################################"
  echo "# WARNING: real data missing under $DATA_DIR"
  echo "#   mnist idx files present:  $have_mnist"
  echo "#   cifar10 batches present:  $have_cifar"
  echo "# Proceeding on the SYNTHETIC stand-in — results are NOT"
  echo "# paper-scale and NOT comparable to the reference's curves."
  echo "##############################################################"
fi

echo "=== [1/3] inception-scorer calibration (anchor: 11.31 +/- 0.08) ==="
python -m rcgan_tpu.evals.calibrate_inception \
  --data_dir "$DATA_DIR/cifar10/cifar-10-batches-py/" \
  --n "$CAL_N" --splits 10 2>&1 | tee "$OUT/calibration.txt"

echo "=== [2/3] the 10-config reference matrix ==="
mcommon="--train --epoch $MNIST_EPOCHS --batch_size 100 --data_dir $DATA_DIR \
  --recover_epoch $RECOVER --compute_dtype bfloat16"

mnist_run() { # name extra-args...
  name=$1; shift
  echo "--- mnist_$name start $(date +%H:%M:%S)"
  python mnist_main.py $mcommon --checkpoint_dir "$OUT/mnist_$name" "$@" \
    > "$OUT/mnist_$name.txt" 2>&1
  echo "--- mnist_$name exit=$? $(date +%H:%M:%S)"
  grep -E "EPOCH=.*accuracy|label recovery" "$OUT/mnist_$name.txt" | tail -3
}
# the six MNIST modes, flags exactly as mnist/run_*.sh
mnist_run biased   --algorithm biased   --alpha 0.6 --disc_type vanilla --loss_fn ce --real_match --noestimate_confuse --noaux_classifier --noadd_noise --noconcat_y --nospectral_norm --nomax_norm
mnist_run unbiased --algorithm unbiased --alpha 0.6 --disc_type projection --noestimate_confuse --noaux_classifier --noadd_noise --noconcat_y --spectral_norm --max_norm
mnist_run ambient  --algorithm ambient  --alpha 0.6 --disc_type vanilla --loss_fn ce --real_match --noestimate_confuse --noaux_classifier --noadd_noise --noconcat_y --nospectral_norm --nomax_norm
mnist_run rcgan    --algorithm rcgan    --alpha 0.3 --disc_type projection --noestimate_confuse --noaux_classifier --noadd_noise --noconcat_y --spectral_norm --max_norm
mnist_run rcganu   --algorithm rcgan    --alpha 0.3 --disc_type projection --estimate_confuse --aux_classifier --noadd_noise --noconcat_y --spectral_norm --max_norm
mnist_run rcgany   --algorithm rcgan    --alpha 0.125 --disc_type projection --noestimate_confuse --noaux_classifier --add_noise --noise_alpha 0.3 --noise_start 30 --noise_end 80 --concat_y --concat_y_layers 1 --spectral_norm --max_norm

ccommon="--data_dir $DATA_DIR/cifar10/cifar-10-batches-py/ --niters $CIFAR_ITERS \
  --multi_gpu_multi_batch --compute_dtype bfloat16"
if [ -n "${SMOKE:-}" ]; then
  ccommon="$ccommon --inception_freq 50 --sample_freq 50 \
    --generated_label_accuracy_freq 50 --eval_train_size 2000 \
    --synthetic_train_size 4000"
fi

cifar_run() { # name extra-args...
  name=$1; shift
  echo "--- cifar_$name start $(date +%H:%M:%S)"
  python cifar_main.py $ccommon --parent_dir "$OUT/cifar_$name" --run 0 "$@" \
    > "$OUT/cifar_$name.txt" 2>&1
  echo "--- cifar_$name exit=$? $(date +%H:%M:%S)"
  grep -E "final generated|inception" "$OUT/cifar_$name.txt" | tail -3
}
# the four CIFAR modes, flags exactly as cifar10/run_*.sh
cifar_run biased   --algorithm biased   --alpha 0.6
cifar_run unbiased --algorithm unbiased --alpha 0.6
cifar_run rcgan    --algorithm rcgan    --alpha 0.6
cifar_run rcganu   --algorithm rcgan-u  --alpha 0.6 --perm_classifier --confuse_init

echo "=== [3/3] sweep figure (from committed archives if present) ==="
python scripts/plot_sweep.py || echo "(sweep figure skipped — no sweep archives)"

echo "=== DONE; artifacts under $OUT ==="
