#!/bin/bash
# Archive a finished CIFAR run into docs/runs/ (committed evidence).
# Usage: archive_cifar_run.sh <expt_dir> <log_file> <dest>
set -e
cd "$(dirname "$0")/.."
SRC=$1; LOG=$2; DEST=$3
mkdir -p $DEST
cp $SRC/config.json $DEST/ 2>/dev/null || true
for f in d_cost g_cost dev_cost gen_label_acc gen_label_acc_perm \
         gen_label_acc_raw inception_50k \
         c_recovery_tv c_recovery_tv_perm c_mean_diag; do
  [ -f $SRC/$f.jpg ] && cp $SRC/$f.jpg $DEST/
done
cp $SRC/command.txt $DEST/ 2>/dev/null || true
first=$(ls $SRC/samples_*.png 2>/dev/null | sort -V | head -1)
last=$(ls $SRC/samples_*.png 2>/dev/null | sort -V | tail -1)
[ -n "$first" ] && cp $first $DEST/
[ -n "$last" ] && cp $last $DEST/
grep -E "alpha = |iter [0-9]*(2499|4999|7499|9999) |final |gen-label-acc raw|inception|gen_label_acc" $LOG | head -200 > $DEST/run.log || true
echo "archived -> $DEST"; ls $DEST
