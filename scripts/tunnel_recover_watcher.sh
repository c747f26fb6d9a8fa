#!/bin/bash
# Poll the axon device tunnel; when it answers again, run phase I (PGGAN
# fix validation + 64x64, quick) then phase H (bench/profile + 50k
# flagship).  Probes are cheap and time-bounded; the loop gives up after
# ~8 hours.
cd "$(dirname "$0")/.."
mkdir -p runs
for i in $(seq 1 ${PROBES:-60}); do
  if timeout 90 python -c "import jax; assert jax.devices()" 2>/dev/null; then
    echo "tunnel back at $(date +%H:%M:%S) (probe $i)"
    rc=0
    bash scripts/run_round3_phaseI.sh > runs/round3_phaseI_driver.log 2>&1 || rc=$?
    bash scripts/run_round3_phaseH.sh > runs/round3_phaseH_driver.log 2>&1 || rc=$?
    if [ $rc -eq 0 ]; then
      echo "phases I+H complete at $(date +%H:%M:%S)"
    else
      echo "phases I+H finished with failures (last rc=$rc) at $(date +%H:%M:%S)"
    fi
    exit $rc
  fi
  sleep 480
done
echo "tunnel never recovered"
exit 1
