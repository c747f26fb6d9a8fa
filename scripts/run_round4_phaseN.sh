#!/bin/bash
# Round-4 phase N: MXU speed-of-light probe (follow-up to the batch-scaling
# study) — one matmul chain + three conv chains through the same stack, to
# attribute the fused cycle's ~55% MFU ceiling to the XLA kernel envelope
# vs framework overhead.  Queued behind phase M.
#
# Usage: WAIT_PID=<pid> bash scripts/run_round4_phaseN.sh
cd "$(dirname "$0")/.."
mkdir -p runs/round4
{
  echo "### phase N start $(date)"
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
  if [ $ok -ne 1 ]; then echo "### tunnel never answered; phase N aborted $(date)"; exit 1; fi

  timeout 1800 python scripts/mxu_sol_probe.py --out docs/perf/mxu_sol_r4.json
  echo "probe exit=$?"
  echo "### phase N done $(date)"
} >> runs/round4/phaseN.log 2>&1
