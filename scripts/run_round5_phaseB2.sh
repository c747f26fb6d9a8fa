#!/bin/bash
# Round-5 phase B2 (queued behind phase B): one extra RCGAN+y sweep cell at
# the ONLY regime where a positive anneal effect could be visible.
#
# Rationale: every alpha in {0.4, 0.5, 0.6} saturates (concat_y-only == 1.0
# by epoch 4), so active-anneal cells there can only demonstrate
# "harmless".  alpha=0.3 is the one committed regime where the
# concat_y-only baseline does NOT saturate (0.850 plateau,
# docs/runs/mnist_ablation_concaty_a0.3) — and round 4's alpha=0.3 cell
# failed because noise_alpha=0.15 put the early effective noise BELOW the
# conditioning threshold.  noise_alpha=0.25 keeps the warm-up inside the
# conditioning range (plain rcgan conditions at alpha=0.3) while still
# exercising a real 0.25->0.30 anneal: if the schedule has any
# regularization value, this is where it shows; if this cell lands at or
# below 0.850, the "anneal never helps on this stand-in" negative is
# demonstrated across the full grid.
#
# Usage: WAIT_PID=<phase B pid> bash scripts/run_round5_phaseB2.sh
cd "$(dirname "$0")/.."
R=runs/round5
S=$R/rcgany_sweep
mkdir -p $S

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
  echo "##### round-5 phase B2 start $(date)"
  if [ -n "$WAIT_PID" ]; then
    echo "waiting for pid $WAIT_PID to release the chip..."
    while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
    echo "pid $WAIT_PID exited at $(date +%H:%M:%S)"
  fi
  probe_tunnel || { echo "### tunnel dead; phase B2 aborted"; exit 1; }

  COMMON="--train --batch_size 100 --compute_dtype bfloat16 --data_dir $R/data \
    --recover_epoch 1000 --disc_type projection --spectral_norm --max_norm \
    --algorithm rcgan --noestimate_confuse --noaux_classifier --epoch 100 \
    --noise_start 30 --noise_end 80 --concat_y --concat_y_layers 1"

  cell="rcgany_a0.3_na0.25"
  if [ -f docs/runs/mnist_sweep5_${cell}/run.log ]; then
    echo "skip $cell"
  else
    echo "=== $cell start $(date +%H:%M:%S) ==="
    timeout 3600 python mnist_main.py $COMMON \
      --alpha 0.3 --add_noise --noise_alpha 0.25 \
      --checkpoint_dir $S/$cell > $S/$cell.txt 2>&1
    echo "=== $cell exit=$? $(date +%H:%M:%S) ==="
    bash scripts/archive_mnist_run.sh $S $cell docs/runs/mnist_sweep5_$cell || true
  fi
  echo "##### round-5 phase B2 done $(date)"
} >> $R/phaseB2.log 2>&1
