#!/bin/bash
# Round-4 phase L2b: continuation of the phase-L2 CIFAR RCGAN-U C-recovery
# run.  Phase L2's 4500 s budget covers ~15k of the 25k iters at the
# measured ~3.8 iters/s (the sustained 0.72 regime appeared at ~22.5k in
# round 3), so this phase re-invokes the SAME experiment dir with
# --expt_dir + --restore (auto-resume from the orbax checkpoint,
# apps/cifar_app.py:219-223 / start_iter = ts.step) and lets it finish,
# then re-archives with the complete C-recovery curve.
#
# Usage: WAIT_PID=<phase-N pid> EXPT=<expt dir name> bash scripts/run_round4_phaseL2b.sh
cd "$(dirname "$0")/.."
mkdir -p runs/round4
{
  echo "### phase L2b start $(date)"
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
  if [ $ok -ne 1 ]; then echo "### tunnel never answered; phase L2b aborted $(date)"; exit 1; fi

  R=./runs/round4
  EXPT=${EXPT:-$(basename $(ls -dt $R/rcgan-u_alpha0.6_run-rcganu_cr4_* 2>/dev/null | head -1))}
  if [ -z "$EXPT" ]; then echo "no expt dir to continue"; exit 1; fi
  echo "continuing $EXPT"
  timeout 7200 python cifar_main.py --algorithm rcgan-u --alpha 0.6 \
    --run rcganu_cr4 --parent_dir $R --expt_dir "$EXPT" \
    --log_file $R/rcganu_cr4.log \
    --niters 25000 --perm_classifier --confuse_init --mesh_devices 1 \
    --nomulti_gpu_multi_batch --compute_dtype bfloat16
  rc=$?
  echo "cifar rcgan-u continuation exit=$rc $(date +%H:%M:%S)"

  bash scripts/archive_cifar_run.sh "$R/$EXPT" $R/rcganu_cr4.log \
    docs/runs/cifar_rcganu_crecovery_25k || true
  grep -E "learned-C recovery" $R/rcganu_cr4.log \
    > docs/runs/cifar_rcganu_crecovery_25k/c_recovery.log || true
  tail -3 docs/runs/cifar_rcganu_crecovery_25k/c_recovery.log
  echo "### phase L2b done $(date)"
} >> runs/round4/phaseL2b.log 2>&1
