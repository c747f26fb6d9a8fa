#!/bin/bash
# Round-3 phase L (optional, after I/H/J/K): extend the CIFAR full-size
# story to a second noise level — rcgan and biased at alpha=0.3 (70% label
# noise), 20k iters each, the same shapes as the committed alpha=0.6
# archives.  Mirrors the MNIST accuracy-vs-alpha sweep one level down:
# MNIST rcgan holds 0.81 at alpha=0.3 while biased collapses to 0.22; this
# measures the same gap on the full-size SNGAN ResNet stack.
cd "$(dirname "$0")/.."
R=${RUNS:-./runs/round3}
mkdir -p $R
common="--alpha 0.3 --niters 20000 --mesh_devices 1 --nomulti_gpu_multi_batch --compute_dtype bfloat16 --parent_dir $R"

lrun() { # name extra-args...
  name=$1; shift
  echo "=== cifar_${name}_a0.3 start $(date +%H:%M:%S) ==="
  timeout 7000 python cifar_main.py $common --run ${name}_a03 \
    --log_file $R/cifar_${name}_a0.3.log --expt_dir cifar_${name}_a0.3 "$@" \
    > $R/cifar_${name}_a0.3.txt 2>&1
  echo "=== cifar_${name}_a0.3 exit=$? $(date +%H:%M:%S) ==="
  grep -E "final generated label accuracy" $R/cifar_${name}_a0.3.log | tail -1
}

lrun rcgan  --algorithm rcgan
lrun biased --algorithm biased
echo "=== phase L complete $(date +%H:%M:%S) ==="
