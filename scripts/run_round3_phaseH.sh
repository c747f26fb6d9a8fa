#!/bin/bash
# Round-3 phase H (reordered after the tunnel outage): the quick
# high-value captures FIRST -- refreshed bench + roofline profile with the
# corrected per-cycle flop accounting (static-unroll count; the rolled
# lax.scan program under-counts ~2x) -- then the flagship CIFAR RCGAN run
# at the reference's FULL 50,000-iteration budget
# (cifar10/gan_resnet.py:53 ITERS=50000; prior full-size runs stopped at
# 20k-40k).  The 50k run streams its log, so a round cutoff mid-run still
# leaves archivable evidence; bench/profile are all-or-nothing.
cd "$(dirname "$0")/.."
R=${RUNS:-./runs/round3}
mkdir -p $R

echo "=== bench start $(date +%H:%M:%S) ==="
timeout 2400 python bench.py > $R/bench_r3b.json 2> $R/bench_r3b.err
echo "=== bench exit=$? ==="
cat $R/bench_r3b.json

echo "=== profile start $(date +%H:%M:%S) ==="
timeout 7200 python scripts/profile_cycle.py --compile_unrolled \
  --out $R/profile_cycle_r3b.json > $R/profile_cycle_r3b.txt 2>&1
echo "=== profile exit=$? ==="
tail -14 $R/profile_cycle_r3b.txt

echo "=== cifar/rcgan 50k start $(date +%H:%M:%S) ==="
timeout 16000 python cifar_main.py --algorithm rcgan --alpha 0.6 --run rcgan50k \
  --parent_dir $R --log_file $R/cifar_rcgan_50k.log --niters 50000 \
  --mesh_devices 1 --nomulti_gpu_multi_batch --compute_dtype bfloat16 \
  --expt_dir cifar_rcgan_50k > $R/cifar_rcgan_50k.txt 2>&1
echo "=== cifar/rcgan 50k exit=$? $(date +%H:%M:%S) ==="
grep -E "final generated label accuracy" $R/cifar_rcgan_50k.log | tail -1
echo "=== phase H complete $(date +%H:%M:%S) ==="
