#!/bin/bash
# Round-4 phase O: MS-SSIM intra-class diversity report against the
# completed CIFAR RCGAN-U C-recovery checkpoint (phase L2b), turning the
# reference's vendored msssim CLI surface into a measured result on a
# trained model.  Cheap (one restore + 320 samples + batched MS-SSIM), so
# it runs wherever the chip queue leaves room; falls back to CPU if the
# tunnel is dead.
#
# Usage: WAIT_PID=<phase-L2b pid> bash scripts/run_round4_phaseO.sh
cd "$(dirname "$0")/.."
mkdir -p runs/round4
{
  echo "### phase O start $(date)"
  if [ -n "$WAIT_PID" ]; then
    echo "waiting for pid $WAIT_PID to release the chip..."
    while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
    echo "pid $WAIT_PID exited at $(date +%H:%M:%S)"
  fi
  PLATFORM=""
  if ! timeout 120 python -c "
import jax, jax.numpy as jnp
assert jax.devices()
assert float(jnp.ones((8, 8)).sum()) == 64.0
" 2>/dev/null; then
    echo "tunnel dead — running the report on CPU"
    PLATFORM="cpu"
  fi

  R=./runs/round4
  EXPT=$(ls -dt $R/rcgan-u_alpha0.6_run-rcganu_cr4_* 2>/dev/null | head -1)
  if [ -z "$EXPT" ]; then echo "no cr4 expt dir; phase O aborted"; exit 1; fi
  echo "reporting on $EXPT"
  RCGAN_PLATFORM=$PLATFORM timeout 1800 python scripts/msssim_report.py \
    --model cifar --checkpoint_dir "$EXPT/checkpoint" \
    --per_class 32 --pairs 200 \
    --out docs/runs/cifar_rcganu_crecovery_25k/msssim.json \
    > runs/round4/msssim_cr4.txt 2>&1
  echo "report exit=$?"
  tail -13 runs/round4/msssim_cr4.txt
  echo "### phase O done $(date)"
} >> runs/round4/phaseO.log 2>&1
