#!/bin/bash
# Round-4 serial on-chip chain: one TPU chip, phases in VERDICT priority
# order.  Each phase is idempotent (cells skip themselves when their .done
# marker exists), so the chain can be re-launched after an interruption.
#   A: fixed profiler artifact + scaling study   (items 3, 8 — ~20 min)
#   B: RCGAN+y 3x3 ablation, 100 ep/cell         (item 1    — ~4.5 h)
#   C: RCGAN-U sweep + best cell at 100 ep       (items 2,6 — ~2 h)
#   J: PGGAN 128x128 on-chip run                 (item 5    — ~1.5 h)
cd "$(dirname "$0")/.."
mkdir -p runs/round4
{
  echo "### round-4 chain start $(date)"
  bash scripts/run_round4_phaseA.sh
  bash scripts/run_round4_phaseB.sh
  bash scripts/run_round4_phaseC.sh
  RUNS=./runs/round4 bash scripts/run_round3_phaseJ.sh
  echo "### round-4 chain done $(date)"
} >> runs/round4/chain.log 2>&1
