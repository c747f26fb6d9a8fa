#!/bin/bash
# Round-4 phase A (VERDICT r3 items 3 + 8): re-run the FIXED profiler and
# commit a clean artifact (profile_cycle_r4.json: piece names "wrt D"/"wrt G",
# d_step ~437 GF, unrolled-cycle flop count) + a real jax.profiler trace of
# the full-size cycle, then the arithmetic-intensity scaling study
# (batch 64/128/256 + dim 256) that tests the "memory-bound at the reference
# config" ceiling claim.
cd "$(dirname "$0")/.."
mkdir -p docs/perf runs/round4

echo "=== profile_cycle_r4 start $(date +%H:%M:%S) ==="
timeout 3000 python scripts/profile_cycle.py --compile_unrolled \
  --out docs/perf/profile_cycle_r4.json \
  --trace_dir runs/round4/profile_trace \
  > runs/round4/profile_cycle_r4.txt 2>&1
echo "=== profile_cycle_r4 exit=$? $(date +%H:%M:%S) ==="
tail -15 runs/round4/profile_cycle_r4.txt

echo "=== bench_scaling_r4 start $(date +%H:%M:%S) ==="
timeout 6000 python scripts/bench_scaling.py --out docs/perf/scaling_r4.json \
  > runs/round4/bench_scaling_r4.txt 2>&1
echo "=== bench_scaling_r4 exit=$? $(date +%H:%M:%S) ==="
tail -8 runs/round4/bench_scaling_r4.txt
echo "=== phase A complete $(date +%H:%M:%S) ==="
