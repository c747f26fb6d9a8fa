#!/bin/bash
# Round-4 phase J chain (VERDICT r3 item 5): run the queued 128x128
# progressive-GAN schedule on-chip AFTER the current watcher queue
# (phase C sweep + scaling study) releases the chip.
#
# Usage: WAIT_PID=<watcher pid> bash scripts/run_round4_phaseJ_chain.sh
#   WAIT_PID — PID of the process currently holding the on-chip queue;
#              we wait for it to EXIT (not kill it) before touching the
#              device.  If unset, starts immediately.
#
# The schedule itself is scripts/run_round3_phaseJ.sh (pinned at tiny
# dims by tests/test_pggan.py::test_stage5_128px_schedule and CPU
# dry-run end-to-end); this wrapper adds the wait, the hardened tunnel
# probe (executes an op — enumeration alone lies, see the half-dead
# failure mode note in parallel/device_probe.py), and immediate
# archiving into docs/runs/ so the evidence survives even if the round
# ends mid-run.
cd "$(dirname "$0")/.."
mkdir -p runs/round4
{
  echo "### phase J chain start $(date)"
  if [ -n "$WAIT_PID" ]; then
    echo "waiting for pid $WAIT_PID to release the chip..."
    while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
    echo "pid $WAIT_PID exited at $(date +%H:%M:%S)"
  fi

  # hardened probe with retries: the tunnel can die between queue items
  ok=0
  for i in $(seq 1 ${PROBES:-24}); do
    if timeout 120 python -c "
import jax, jax.numpy as jnp
assert jax.devices()
assert float(jnp.ones((8, 8)).sum()) == 64.0
" 2>/dev/null; then ok=1; echo "tunnel alive (probe $i)"; break; fi
    sleep 300
  done
  if [ $ok -ne 1 ]; then echo "### tunnel never answered; phase J aborted $(date)"; exit 1; fi

  RUNS=./runs/round4 bash scripts/run_round3_phaseJ.sh

  R=./runs/round4
  if [ -f "$R/pggan128_cond/stage_accuracy.json" ]; then
    bash scripts/archive_pggan_run.sh $R/pggan128_cond $R/pggan128_cond.txt \
      docs/runs/pggan128_cond || true
  else
    echo "no stage_accuracy.json — run failed or truncated; archiving the log only"
    mkdir -p docs/runs/pggan128_cond
    grep -E "stage|gen_label_acc|accuracy|phase|pin|Error|error" \
      $R/pggan128_cond.txt | head -120 > docs/runs/pggan128_cond/run.log || true
  fi
  echo "### phase J chain done $(date)"
} >> runs/round4/phaseJ_chain.log 2>&1
