#!/bin/bash
# Round-4 phase C (VERDICT r3 items 2 + 6): stabilize (or explain) MNIST
# RCGAN-U.  The r3 baseline (confuse_multiplier 10, glorot C-init,
# perm_multiplier 10) oscillated: final 0.435, peaks 0.88-0.89.
#
# Stage 1 — 40-epoch exploration sweep over the reference's own knobs
# (confuse_multiplier mnist/model.py:259-262, the CIFAR --confuse_init
# diagonal init gan_resnet.py:504-520 ported to MNIST, perm_multiplier),
# each logging the learned-C recovery trajectory (perm-corrected TV).
# Stage 2 — the best cell re-run at the full 100-epoch budget.
cd "$(dirname "$0")/.."
R=${RUNS:-./runs/round4/rcganu_sweep}
mkdir -p $R
common="--train --batch_size 100 --compute_dtype bfloat16 \
  --data_dir $R/data --recover_epoch 1000 --disc_type projection \
  --spectral_norm --max_norm --algorithm rcgan --alpha 0.3 \
  --estimate_confuse --aux_classifier --noadd_noise --noconcat_y"

run() { # name epochs args...
  name=$1; ep=$2; shift 2
  if [ -f "$R/$name.done" ]; then echo "=== $name already done, skip"; return; fi
  echo "=== $name start $(date +%H:%M:%S) ==="
  timeout 3600 python mnist_main.py $common --epoch $ep --checkpoint_dir $R/$name "$@" \
    > $R/$name.txt 2>&1
  rc=$?
  echo "=== $name exit=$rc $(date +%H:%M:%S) ==="
  grep -E "EPOCH=.*(accuracy|recovery)" $R/$name.txt | tail -4
  [ $rc -eq 0 ] && touch $R/$name.done
}

EP=${SWEEP_EPOCHS:-40}
run cm10_base   $EP --confuse_multiplier 10 --perm_multiplier 10
run cm1         $EP --confuse_multiplier 1  --perm_multiplier 10
run cm3         $EP --confuse_multiplier 3  --perm_multiplier 10
run cm10_diag   $EP --confuse_multiplier 10 --perm_multiplier 10 --confuse_init --confuse_init_diag 0.2
run cm1_diag    $EP --confuse_multiplier 1  --perm_multiplier 10 --confuse_init --confuse_init_diag 0.2
run cm10_pm1    $EP --confuse_multiplier 10 --perm_multiplier 1
run cm1_pm1     $EP --confuse_multiplier 1  --perm_multiplier 1

# ---- pick the best exploration cell by its LAST gen-label-acc and re-run
# at the full 100-epoch budget
best=$(python - "$R" <<'EOF'
import re, sys, glob, os
root = sys.argv[1]
best, best_acc = None, -1.0
for f in glob.glob(os.path.join(root, "*.txt")):
    name = os.path.basename(f)[:-4]
    if name.startswith("best_"):
        continue
    accs = re.findall(r"mean generated label accuracy=([0-9.]+)", open(f).read())
    if not accs:
        continue
    acc = float(accs[-1])
    if acc > best_acc:
        best, best_acc = name, acc
print(best or "cm10_diag")
EOF
)
echo "=== best exploration cell: $best ==="
cp $R/$best/*/config.json $R/best_config.json 2>/dev/null || true
args=$(python - "$R/best_config.json" <<'EOF'
import json, sys
try:
    cfg = json.load(open(sys.argv[1]))
except Exception:
    cfg = {"confuse_multiplier": 10.0, "perm_multiplier": 10.0, "confuse_init": True}
parts = [f"--confuse_multiplier {cfg.get('confuse_multiplier', 10.0)}",
         f"--perm_multiplier {cfg.get('perm_multiplier', 10.0)}",
         f"--confuse_init_diag {cfg.get('confuse_init_diag', 0.2)}"]
parts.append("--confuse_init" if cfg.get("confuse_init") else "--noconfuse_init")
print(" ".join(parts))
EOF
)
run best_100ep 100 $args
echo "=== phase C complete $(date +%H:%M:%S) ==="
