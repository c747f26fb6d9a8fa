#!/bin/bash
# Wait for the tunnel-recovery watcher (phases I+H) to exit, then — if the
# device tunnel is actually up — run the remaining queued phases in
# evidence-per-hour order: K (MNIST rcgan+y with an ACTIVE re-noising
# schedule, ~50 min), J (128px progressive, ~3h), L (CIFAR alpha=0.3
# full-size cells, ~1.5h).  Keeps the chip busy the moment the queued
# phases drain, without a human in the loop.  Safe to re-run; each phase
# no-ops if its output already exists.
cd "$(dirname "$0")/.."
WPID=$(cat /tmp/tunnel_watcher.pid 2>/dev/null)
if [ -n "$WPID" ]; then
  while kill -0 "$WPID" 2>/dev/null; do sleep 120; done
fi
echo "watcher gone at $(date +%H:%M:%S); probing tunnel"
ok=0
for i in 1 2 3; do
  if timeout 90 python -c "import jax; assert jax.devices()" 2>/dev/null; then ok=1; break; fi
  sleep 240
done
if [ "$ok" != 1 ]; then
  echo "tunnel still down after watcher exit; not running phases K/J/L"
  exit 1
fi
if [ ! -s runs/round3/rcgany_a0.6.txt ]; then
  bash scripts/run_round3_phaseK.sh > runs/round3_phaseK_driver.log 2>&1
  echo "phase K exit=$? at $(date +%H:%M:%S)"
fi
if [ ! -s runs/round3/pggan128_cond.txt ]; then
  bash scripts/run_round3_phaseJ.sh > runs/round3_phaseJ_driver.log 2>&1
  echo "phase J exit=$? at $(date +%H:%M:%S)"
fi
if [ ! -s runs/round3/cifar_rcgan_a0.3.txt ]; then
  bash scripts/run_round3_phaseL.sh > runs/round3_phaseL_driver.log 2>&1
  echo "phase L exit=$? at $(date +%H:%M:%S)"
fi
echo "chain complete at $(date +%H:%M:%S)"
