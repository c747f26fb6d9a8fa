#!/bin/bash
# Archive a finished progressive-GAN run into docs/runs/ (committed
# evidence).  Usage: archive_pggan_run.sh <run_dir> <stdout_log> <dest>
#   e.g. archive_pggan_run.sh runs/round3/pggan64_cond3 \
#          runs/round3/pggan64_cond3.txt docs/runs/pggan64_cond
set -e
cd "$(dirname "$0")/.."
SRC=$1; LOG=$2; DEST=$3
mkdir -p $DEST
cp $SRC/config.json $SRC/command.txt $SRC/stage_accuracy.json $DEST/ 2>/dev/null || true
cp $SRC/d_cost.jpg $SRC/g_cost.jpg $DEST/ 2>/dev/null || true
cp $SRC/gen_label_acc_stage*.jpg $DEST/ 2>/dev/null || true
# final (stab) sample grid per stage
for f in $SRC/samples_stage*_stab.png; do [ -f "$f" ] && cp "$f" $DEST/; done
# trimmed stdout: phase rows, per-stage eval rows, the final accuracy table
grep -E "stage|gen_label_acc|accuracy|phase|pin" $LOG | head -120 > $DEST/run.log || true
echo "archived -> $DEST"; ls $DEST
