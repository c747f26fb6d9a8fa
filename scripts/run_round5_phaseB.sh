#!/bin/bash
# Round-5 phase B (queued behind the CIFAR 50k chain):
#   1. conv-kernel A/B microbench (VERDICT r4 item 3) — decides the
#      RCGAN_PALLAS_CONV3X3 routing default.
#   2. RCGAN+y regime sweep (item 4): 4 active-schedule cells
#      (alpha, noise_alpha) in {0.4, 0.5} x {0.25, 0.35} + the 2
#      concat_y-only baselines at the same alphas.  The schedule is ACTIVE
#      exactly when noise_alpha < alpha (extra corruption early, annealed
#      away by noise_end; at the reference's own alpha=0.125/noise_alpha=0.3
#      the requested effective noise is unreachable and the schedule is
#      inert — round-4 finding).
#   3. Class-dependent-confusion end-to-end cells (item 5): known-C RCGAN
#      and learned-C RCGAN-U on the reference's per-class random C
#      (mnist/model.py:811-816) at alpha=0.9.
#   4. bench.py for the round record.
#
# Usage: WAIT_PID=<cifar chain pid> bash scripts/run_round5_phaseB.sh
cd "$(dirname "$0")/.."
R=runs/round5
mkdir -p $R/rcgany_sweep $R/classdep

probe_tunnel() {
  for i in $(seq 1 ${PROBES:-24}); do
    if timeout 120 python -c "
import jax, jax.numpy as jnp
assert jax.devices()[0].platform == 'tpu'
assert float(jnp.ones((8, 8)).sum()) == 64.0
" 2>/dev/null; then echo "tunnel alive (probe $i)"; return 0; fi
    sleep 120
  done
  return 1
}

{
  echo "##### round-5 phase B start $(date)"
  if [ -n "$WAIT_PID" ]; then
    echo "waiting for pid $WAIT_PID to release the chip..."
    while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
    echo "pid $WAIT_PID exited at $(date +%H:%M:%S)"
  fi
  probe_tunnel || { echo "### tunnel dead; phase B aborted"; exit 1; }

  echo "=== conv kernel A/B $(date +%H:%M:%S) ==="
  timeout 2400 python scripts/bench_conv_kernel.py > $R/conv_ab.txt 2>&1
  echo "conv A/B exit=$? ==="
  tail -6 $R/conv_ab.txt

  COMMON="--train --batch_size 100 --compute_dtype bfloat16 --data_dir $R/data \
    --recover_epoch 1000 --disc_type projection --spectral_norm --max_norm \
    --algorithm rcgan --noestimate_confuse --noaux_classifier --epoch 100 \
    --noise_start 30 --noise_end 80 --concat_y --concat_y_layers 1"

  S=$R/rcgany_sweep
  for alpha in 0.4 0.5; do
    for na in 0.25 0.35; do
      cell="rcgany_a${alpha}_na${na}"
      [ -f docs/runs/mnist_sweep5_${cell}/run.log ] && { echo "skip $cell"; continue; }
      echo "=== $cell start $(date +%H:%M:%S) ==="
      timeout 3600 python mnist_main.py $COMMON \
        --alpha $alpha --add_noise --noise_alpha $na \
        --checkpoint_dir $S/$cell > $S/$cell.txt 2>&1
      echo "=== $cell exit=$? $(date +%H:%M:%S) ==="
      bash scripts/archive_mnist_run.sh $S $cell docs/runs/mnist_sweep5_$cell || true
    done
    cell="concaty_a${alpha}"
    [ -f docs/runs/mnist_sweep5_${cell}/run.log ] && { echo "skip $cell"; continue; }
    echo "=== $cell start $(date +%H:%M:%S) ==="
    timeout 3600 python mnist_main.py $COMMON \
      --alpha $alpha --noadd_noise \
      --checkpoint_dir $S/$cell > $S/$cell.txt 2>&1
    echo "=== $cell exit=$? $(date +%H:%M:%S) ==="
    bash scripts/archive_mnist_run.sh $S $cell docs/runs/mnist_sweep5_$cell || true
  done

  C=$R/classdep
  CD_COMMON="--train --batch_size 100 --compute_dtype bfloat16 --data_dir $C/data \
    --recover_epoch 1000 --disc_type projection --spectral_norm --max_norm \
    --noadd_noise --noconcat_y --epoch 100 --alpha 0.9 --confusion_class_depend"

  echo "=== classdep_rcgan start $(date +%H:%M:%S) ==="
  timeout 3600 python mnist_main.py $CD_COMMON \
    --algorithm rcgan --noestimate_confuse --noaux_classifier \
    --checkpoint_dir $C/classdep_rcgan > $C/classdep_rcgan.txt 2>&1
  echo "=== classdep_rcgan exit=$? $(date +%H:%M:%S) ==="
  bash scripts/archive_mnist_run.sh $C classdep_rcgan docs/runs/mnist_classdep_rcgan || true

  echo "=== classdep_rcganu start $(date +%H:%M:%S) ==="
  timeout 3600 python mnist_main.py $CD_COMMON \
    --algorithm rcgan --estimate_confuse --aux_classifier --confuse_multiplier 1.0 \
    --perm_multiplier 10.0 --confuse_init --confuse_init_diag 0.2 \
    --checkpoint_dir $C/classdep_rcganu > $C/classdep_rcganu.txt 2>&1
  echo "=== classdep_rcganu exit=$? $(date +%H:%M:%S) ==="
  bash scripts/archive_mnist_run.sh $C classdep_rcganu docs/runs/mnist_classdep_rcganu || true

  echo "=== bench $(date +%H:%M:%S) ==="
  timeout 1800 python bench.py > $R/bench_r5.txt 2>&1
  echo "bench exit=$?"
  tail -2 $R/bench_r5.txt
  echo "##### round-5 phase B done $(date)"
} >> $R/phaseB.log 2>&1
