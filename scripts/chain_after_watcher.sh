#!/bin/bash
# Supervisor for the queued on-chip phases during/after the device-tunnel
# outage.  Waits for the tunnel-recovery watcher (which runs phases I+H
# itself when it sees the tunnel) to exit, then keeps probing until
# DEADLINE_EPOCH (default: +11h from launch).  On recovery it runs, in
# order, any phase whose *completion marker* is missing:
#   I (PGGAN stage-3 fix validation + 64px conditional, ~2h)
#   H (bench refresh + roofline profile + flagship 50k CIFAR RCGAN, ~6h)
#   K (MNIST rcgan+y alpha=0.6 with the re-noising schedule active, ~1h)
#   J (128px progressive schedule, ~3h)
#   L (CIFAR alpha=0.3 full-size cells, ~1.5h)
# Completion markers are substantive outputs, not driver stubs, so a probe
# that died mid-outage does not mask a phase.  Safe to re-run.
cd "$(dirname "$0")/.."
DEADLINE=${DEADLINE_EPOCH:-$(( $(date +%s) + 39600 ))}

probe() { timeout 90 python -c "import jax; assert jax.devices()" 2>/dev/null; }

phase_I_done() { grep -q "phase I complete" runs/round3_phaseI_driver.log runs/round3_phaseIb_driver.log 2>/dev/null; }
phase_H_done() { grep -q "final generated label accuracy" runs/round3/cifar_rcgan_50k.log 2>/dev/null; }
phase_K_done() { grep -q "label recovery" runs/round3/rcgany_a0.6.txt 2>/dev/null; }
phase_J_done() { grep -q "gen_label_acc" runs/round3/pggan128_cond.txt 2>/dev/null; }
phase_L_done() { grep -q "final generated label accuracy" runs/round3/cifar_biased_a0.3.log 2>/dev/null; }

WPID=$(cat /tmp/tunnel_watcher.pid 2>/dev/null)
if [ -n "$WPID" ]; then
  while kill -0 "$WPID" 2>/dev/null; do
    if [ "$(date +%s)" -ge "$DEADLINE" ]; then echo "deadline hit while watcher alive"; exit 1; fi
    sleep 120
  done
fi
echo "watcher gone at $(date -u +%H:%M:%S); probing tunnel until $(date -u -d @$DEADLINE +%H:%M:%S) UTC"
ok=0
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  if probe; then ok=1; break; fi
  sleep 300
done
if [ "$ok" != 1 ]; then
  echo "tunnel never recovered before deadline; no phases run"
  exit 1
fi
echo "tunnel up at $(date -u +%H:%M:%S) UTC"

run_phase() {  # $1=letter
  echo "=== phase $1 start $(date -u +%H:%M:%S) UTC ==="
  bash "scripts/run_round3_phase$1.sh" > "runs/round3_phase$1b_driver.log" 2>&1
  echo "=== phase $1 exit=$? at $(date -u +%H:%M:%S) UTC ==="
}

phase_I_done || run_phase I
phase_H_done || run_phase H
phase_K_done || run_phase K
phase_J_done || run_phase J
phase_L_done || run_phase L
echo "chain complete at $(date -u +%H:%M:%S) UTC"
