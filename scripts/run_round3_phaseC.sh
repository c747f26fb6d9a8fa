#!/bin/bash
# Round-3 phase C: CIFAR unbiased rerun (after the projection-kernel VJP
# dtype fix), then the perf captures: bench + per-piece roofline profile.
cd "$(dirname "$0")/.."
R=${RUNS:-./runs/round3}
mkdir -p $R

echo "=== cifar/unbiased start $(date +%H:%M:%S) ==="
timeout 6000 python cifar_main.py --algorithm unbiased --alpha 0.6 --run unbiased_r3 \
  --parent_dir $R --log_file $R/cifar_unbiased_r3.log --niters 20000 \
  --mesh_devices 1 --nomulti_gpu_multi_batch --compute_dtype bfloat16 \
  --expt_dir cifar_unbiased_r3 > $R/cifar_unbiased_r3.txt 2>&1
echo "=== cifar/unbiased exit=$? $(date +%H:%M:%S) ==="
grep -E "final generated label accuracy" $R/cifar_unbiased_r3.log | tail -1

echo "=== bench start $(date +%H:%M:%S) ==="
timeout 2400 python bench.py > $R/bench_r3.json 2> $R/bench_r3.err
echo "=== bench exit=$? ==="
cat $R/bench_r3.json

echo "=== profile start $(date +%H:%M:%S) ==="
timeout 2400 python scripts/profile_cycle.py --out $R/profile_cycle.json > $R/profile_cycle.txt 2>&1
echo "=== profile exit=$? ==="
tail -12 $R/profile_cycle.txt
echo "=== phase C complete $(date +%H:%M:%S) ==="
