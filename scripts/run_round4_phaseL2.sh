#!/bin/bash
# Round-4 phase L2 (VERDICT r3 item 6, CIFAR side): the learned-C recovery
# metric (permutation-corrected row-wise TV, evals/confusion_recovery.py)
# is wired into cifar_app at the gen-label-acc cadence, but the committed
# full-size CIFAR RCGAN-U run predates it — the "diag 0.46-0.49 vs 0.60"
# footnote is still un-tracked on the CIFAR stack.  Re-run CIFAR RCGAN-U
# at the round-3 full-size config for 25k iters (the round-3 run entered
# its sustained 0.72 regime at ~22.5k) so the C-recovery CURVE exists as
# committed CIFAR evidence.
#
# Usage: WAIT_PID=<pid> bash scripts/run_round4_phaseL2.sh
#   Waits for WAIT_PID (the phase-J chain) to EXIT before touching the
#   device; probes with the hardened execute-an-op check.
cd "$(dirname "$0")/.."
mkdir -p runs/round4
{
  echo "### phase L2 start $(date)"
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
  if [ $ok -ne 1 ]; then echo "### tunnel never answered; phase L2 aborted $(date)"; exit 1; fi

  R=./runs/round4
  timeout 4500 python cifar_main.py --algorithm rcgan-u --alpha 0.6 \
    --run rcganu_cr4 --parent_dir $R --log_file $R/rcganu_cr4.log \
    --niters 25000 --perm_classifier --confuse_init --mesh_devices 1 \
    --nomulti_gpu_multi_batch --compute_dtype bfloat16
  rc=$?
  echo "cifar rcgan-u exit=$rc $(date +%H:%M:%S)"

  expt=$(ls -dt $R/rcgan-u_alpha0.6_run-rcganu_cr4_* 2>/dev/null | head -1)
  if [ -n "$expt" ]; then
    bash scripts/archive_cifar_run.sh "$expt" $R/rcganu_cr4.log \
      docs/runs/cifar_rcganu_crecovery_25k || true
    grep -E "learned-C recovery" $R/rcganu_cr4.log \
      > docs/runs/cifar_rcganu_crecovery_25k/c_recovery.log || true
    tail -5 docs/runs/cifar_rcganu_crecovery_25k/c_recovery.log
  else
    echo "no expt dir found — run failed before creating one"
  fi
  echo "### phase L2 done $(date)"
} >> runs/round4/phaseL2.log 2>&1
