#!/bin/bash
# Phase K + auto-archive + commit: run the MNIST rcgan+y alpha=0.6 cell
# (the one +y configuration where the reference's annealed re-noising
# schedule is ACTIVE — see run_round3_phaseK.sh header), then archive the
# finished run into docs/runs/ and commit it, so the evidence lands even
# if the session ends while this runs in the background.
set -u
cd "$(dirname "$0")/.."
R=${RUNS:-./runs/round3}
mkdir -p $R

bash scripts/run_round3_phaseK.sh > $R/phaseK_driver.log 2>&1
if ! grep -q "label recovery" $R/rcgany_a0.6.txt 2>/dev/null; then
  echo "phase K did not finish; not archiving" >> $R/phaseK_driver.log
  exit 1
fi

# layout already matches the archiver: $R/rcgany_a0.6/<run>/ + $R/rcgany_a0.6.txt
bash scripts/archive_mnist_run.sh $R rcgany_a0.6 docs/runs/mnist_rcgany_a0.6_100ep \
  >> $R/phaseK_driver.log 2>&1

git add docs/runs/mnist_rcgany_a0.6_100ep
git commit -m "Archive MNIST rcgan+y alpha=0.6 cell: the re-noising schedule active at full budget" \
  >> $R/phaseK_driver.log 2>&1
echo "phase K chain complete $(date -u +%H:%M:%S)"
