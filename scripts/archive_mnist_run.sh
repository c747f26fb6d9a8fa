#!/bin/bash
# Archive a finished MNIST matrix run into docs/runs/ (committed evidence).
# Usage: archive_mnist_run.sh <matrix_dir> <name> <dest>
#   e.g. archive_mnist_run.sh runs/mnist_matrix biased docs/runs/mnist_biased_100ep
set -e
cd "$(dirname "$0")/.."
SRC_ROOT=$1; NAME=$2; DEST=$3
RUN_DIR=$(ls -d $SRC_ROOT/$NAME/*/ | head -1)
LOG=$SRC_ROOT/$NAME.txt
mkdir -p $DEST
cp $RUN_DIR/config.json $RUN_DIR/*.jpg $DEST/ 2>/dev/null || true
[ -f $RUN_DIR/recover_wrong_images.png ] && cp $RUN_DIR/recover_wrong_images.png $DEST/
# earliest and latest end-of-epoch sample grids
first=$(ls $RUN_DIR/samples/train_*_0699.png 2>/dev/null | sort | head -1)
last=$(ls $RUN_DIR/samples/train_*_0699.png 2>/dev/null | sort | tail -1)
[ -n "$first" ] && cp $first $DEST/
[ -n "$last" ] && cp $last $DEST/
# trimmed log: classifier pin, per-eval accuracy, recovery
grep -E "clean accuracy|######EPOCH=|label recovery|re-noising|learned-C recovery" $LOG > $DEST/run.log || true
grep -E "label recovery accuracy" $LOG | tail -1 | sed 's/.*accuracy: /accuracy /' > $DEST/recovery.txt || true
python - "$RUN_DIR/config.json" "$DEST/command.txt" <<'EOF'
import json, sys
cfg = json.load(open(sys.argv[1]))
parts = ["mnist_main.py"]
for k, v in sorted(cfg.items()):
    if isinstance(v, bool):
        parts.append(("--" if v else "--no") + k)
    else:
        parts.append(f"--{k} {v}")
open(sys.argv[2], "w").write(" ".join(parts) + "\n")
EOF
echo "archived $NAME -> $DEST"
ls $DEST
