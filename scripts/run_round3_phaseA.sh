#!/bin/bash
# Round-3 phase A: the four reference run configs still lacking full-budget
# validation (VERDICT r2, Missing #2). Serial on the one TPU chip.
#   1. MNIST rcgan-u  (mnist/run_rcganu.sh shape)  100 epochs
#   2. MNIST rcgan+y  (mnist/run_rcgany.sh shape)  100 epochs
#   3. CIFAR biased   (cifar10/run_biased.sh)      20k iters full size
#   4. CIFAR unbiased (cifar10/run_unbiased.sh)    20k iters full size
cd "$(dirname "$0")/.."
R=${RUNS:-./runs/round3}
mkdir -p $R
mcommon="--train --epoch 100 --batch_size 100 --compute_dtype bfloat16 --data_dir ./runs/mnist_matrix/data --recover_epoch 1000"

mrun() { # name args...
  name=$1; shift
  echo "=== mnist/$name start $(date +%H:%M:%S) ==="
  timeout 3600 python mnist_main.py $mcommon --checkpoint_dir $R/$name "$@" > $R/$name.txt 2>&1
  echo "=== mnist/$name exit=$? $(date +%H:%M:%S) ==="
  grep -E "EPOCH=(4|49|99),|label recovery" $R/$name.txt | tail -4
}

crun() { # name algo extra...
  name=$1; algo=$2; shift 2
  echo "=== cifar/$name start $(date +%H:%M:%S) ==="
  timeout 6000 python cifar_main.py --algorithm $algo --alpha 0.6 --run $name \
    --parent_dir $R --log_file $R/cifar_$name.log --niters 20000 \
    --mesh_devices 1 --nomulti_gpu_multi_batch --compute_dtype bfloat16 \
    --expt_dir cifar_$name "$@" > $R/cifar_$name.txt 2>&1
  echo "=== cifar/$name exit=$? $(date +%H:%M:%S) ==="
  grep -E "final generated label accuracy|gen_label_acc" $R/cifar_$name.log 2>/dev/null | tail -2
}

mrun rcganu --algorithm rcgan --alpha 0.3 --disc_type projection --estimate_confuse --aux_classifier --noadd_noise --noconcat_y --spectral_norm --max_norm
mrun rcgany --algorithm rcgan --alpha 0.125 --disc_type projection --noestimate_confuse --noaux_classifier --add_noise --noise_alpha 0.3 --noise_start 30 --noise_end 80 --concat_y --concat_y_layers 1 --spectral_norm --max_norm
crun biased biased
crun unbiased unbiased
echo "=== phase A complete $(date +%H:%M:%S) ==="
