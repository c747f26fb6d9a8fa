#!/bin/bash
# Round-4 on-chip chain, v3 — reordered for the actual remaining window
# (~70 min of chip time).  Priority = VERDICT r3 item 1 (the judge's
# top_next): the RCGAN+y ablation at alpha=0.3, the regime where plain
# rcgan lands at 0.807 (docs/runs/mnist_rcgan_100ep) so a +y shift is
# measurable.  Cell (a) plain-rcgan@0.3 reuses that committed archive;
# this chain runs (c) full +y with an ACTIVE anneal first (most
# important — carries the new per-epoch rel_alpha/survival logging that
# proves the schedule anneals), then (b) concat_y-only for ingredient
# attribution, then the fixed-profiler artifact (item 3) if the clock
# still allows.  Each cell is archived into docs/runs/ IMMEDIATELY after
# it finishes so the evidence is in the tree even if the round ends
# mid-chain.  Cells are idempotent via .done markers.
cd "$(dirname "$0")/.."
mkdir -p runs/round4 docs/perf
DEADLINE=${DEADLINE:?set DEADLINE (unix seconds)}

left() { echo $(( DEADLINE - $(date +%s) )); }

{
  echo "### round-4 chain v3 start $(date) (budget $(left)s)"

  R=./runs/round4/rcgany_ablation
  mkdir -p $R
  common="--train --epoch 100 --batch_size 100 --compute_dtype bfloat16 \
    --data_dir $R/data --recover_epoch 1000 --disc_type projection \
    --spectral_norm --max_norm --noestimate_confuse --noaux_classifier \
    --algorithm rcgan"
  runb() {
    name=$1; shift
    if [ -f "$R/$name.done" ]; then echo "=== $name already done, skip"; return; fi
    t=$(( $(left) - 200 )); [ $t -gt 3000 ] && t=3000
    if [ $t -lt 1100 ]; then echo "=== $name SKIPPED (only $(left)s left)"; return; fi
    echo "=== $name start $(date +%H:%M:%S), $(left)s left, timeout ${t}s ==="
    timeout $t python mnist_main.py $common --checkpoint_dir $R/$name "$@" \
      > $R/$name.txt 2>&1
    rc=$?
    echo "=== $name exit=$rc $(date +%H:%M:%S) ==="
    grep -E "EPOCH=(49|74|99),|label recovery|re-noising: rel" $R/$name.txt | tail -8
    # archive whatever completed (rc=124 -> truncated run, still evidence)
    bash scripts/archive_mnist_run.sh runs/round4/rcgany_ablation $name \
      docs/runs/mnist_ablation_${name} || true
    [ $rc -eq 124 ] && echo "TRUNCATED by chain timeout at ${t}s (round clock)" \
      >> docs/runs/mnist_ablation_${name}/run.log
    [ $rc -eq 0 ] && touch $R/$name.done
  }
  runb "rcgany_a0.3"  --alpha 0.3 --add_noise --noise_alpha 0.15 \
       --noise_start 30 --noise_end 80 --concat_y --concat_y_layers 1
  runb "concaty_a0.3" --alpha 0.3 --noadd_noise --concat_y --concat_y_layers 1

  # ---- item 3: fixed profiler artifact, if the clock allows
  if [ "$(left)" -ge 900 ] && [ ! -f docs/perf/profile_cycle_r4.json ]; then
    echo "=== profile_cycle_r4 start $(date +%H:%M:%S), $(left)s left ==="
    timeout $(( $(left) - 200 )) python scripts/profile_cycle.py --compile_unrolled \
      --out docs/perf/profile_cycle_r4.json \
      --trace_dir runs/round4/profile_trace \
      > runs/round4/profile_cycle_r4.txt 2>&1
    echo "=== profile_cycle_r4 exit=$? $(date +%H:%M:%S) ==="
    tail -12 runs/round4/profile_cycle_r4.txt
  else
    echo "=== profiler SKIPPED (only $(left)s left)"
  fi

  echo "### round-4 chain v3 done $(date) ($(left)s unused)"
} >> runs/round4/chain_v3.log 2>&1
