#!/bin/bash
# Round-4 phase M: demonstrations that exist in the flag surface but have
# never been run in any round, queued behind phase L2 (CIFAR C-recovery).
#
#   classdep_rcgan   — MNIST known-C RCGAN on the reference's CLASS-DEPENDENT
#                      confusion matrix (--confusion_class_depend,
#                      mnist/model.py:811-816: per-class diagonals
#                      linspace(0.15, -0.15+2a)[:10], i.e. survival 0.15-0.43
#                      at a=0.9 — every class noisier than the paper's
#                      one-coin a=0.3).  First committed non-one-coin run.
#   classdep_rcganu  — RCGAN-U (learned C) on the same class-dependent C with
#                      the stable recipe from the round-4 sweep (cm=1 + diag
#                      init); perm-TV now measures recovery of a matrix with
#                      ten DIFFERENT rows, a strictly harder target than the
#                      one-coin C.
#   seed2_cm1_diag   — second-seed replication of the sweep's best cell
#                      (one-coin a=0.3), robustness check on the
#                      stabilization claim.
#
# Usage: WAIT_PID=<pid> bash scripts/run_round4_phaseM.sh
cd "$(dirname "$0")/.."
mkdir -p runs/round4/classdep
{
  echo "### phase M start $(date)"
  if [ -n "$WAIT_PID" ]; then
    echo "waiting for pid $WAIT_PID to release the chip..."
    while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
    echo "pid $WAIT_PID exited at $(date +%H:%M:%S)"
  fi

  ok=0
  for i in $(seq 1 ${PROBES:-24}); do
    if timeout 120 python -c "
import jax, jax.numpy as jnp
assert jax.devices()
assert float(jnp.ones((8, 8)).sum()) == 64.0
" 2>/dev/null; then ok=1; echo "tunnel alive (probe $i)"; break; fi
    sleep 300
  done
  if [ $ok -ne 1 ]; then echo "### tunnel never answered; phase M aborted $(date)"; exit 1; fi

  R=./runs/round4/classdep
  COMMON="--train --batch_size 100 --compute_dtype bfloat16 --data_dir $R/data \
    --recover_epoch 1000 --disc_type projection --spectral_norm --max_norm \
    --noadd_noise --noconcat_y --epoch 100"

  echo "=== classdep_rcgan start $(date +%H:%M:%S) ==="
  timeout 3600 python mnist_main.py $COMMON \
    --algorithm rcgan --alpha 0.9 --confusion_class_depend \
    --noestimate_confuse --noaux_classifier \
    --checkpoint_dir $R/classdep_rcgan > $R/classdep_rcgan.txt 2>&1
  echo "=== classdep_rcgan exit=$? $(date +%H:%M:%S) ==="

  echo "=== classdep_rcganu start $(date +%H:%M:%S) ==="
  timeout 3600 python mnist_main.py $COMMON \
    --algorithm rcgan --alpha 0.9 --confusion_class_depend \
    --estimate_confuse --aux_classifier --confuse_multiplier 1.0 \
    --perm_multiplier 10.0 --confuse_init --confuse_init_diag 0.2 \
    --checkpoint_dir $R/classdep_rcganu > $R/classdep_rcganu.txt 2>&1
  echo "=== classdep_rcganu exit=$? $(date +%H:%M:%S) ==="

  echo "=== seed2_cm1_diag start $(date +%H:%M:%S) ==="
  timeout 3600 python mnist_main.py $COMMON \
    --algorithm rcgan --alpha 0.3 \
    --estimate_confuse --aux_classifier --confuse_multiplier 1.0 \
    --perm_multiplier 10.0 --confuse_init --confuse_init_diag 0.2 \
    --seed 1093 \
    --checkpoint_dir $R/seed2_cm1_diag > $R/seed2_cm1_diag.txt 2>&1
  echo "=== seed2_cm1_diag exit=$? $(date +%H:%M:%S) ==="

  for cell in classdep_rcgan classdep_rcganu seed2_cm1_diag; do
    if [ -d "$R/$cell" ]; then
      bash scripts/archive_mnist_run.sh $R $cell docs/runs/mnist_$cell || true
    fi
  done

  echo "=== bench sanity $(date +%H:%M:%S) ==="
  timeout 900 python bench.py > runs/round4/bench_night.txt 2>&1
  echo "bench exit=$?"
  tail -2 runs/round4/bench_night.txt
  echo "### phase M done $(date)"
} >> runs/round4/phaseM.log 2>&1
