#!/bin/bash
# Round-4 TRIMMED serial on-chip chain — fits the ~2.5h of chip time left
# in the round (the full chain needs ~8.5h).  Priority = VERDICT r3 order:
#   A:      fixed profiler artifact + scaling study      (items 3, 8 — ~20 min)
#   B-trim: RCGAN+y ablation at alpha=0.3, 100 ep/cell   (item 1    — ~70 min)
#           cell (a) plain-rcgan@0.3 reuses the committed full-budget archive
#           docs/runs/mnist_rcgan_100ep (identical flags/budget), so only the
#           two +y cells run fresh: +concat_y only, and full +y with an
#           ACTIVE anneal (noise_alpha=0.15 < alpha=0.3 so alpha_start<1).
#   C-trim: RCGAN-U stabilization sweep, 25-ep cells     (items 2,6 — ~50 min)
#           then the best cell at the budget the clock still allows.
# Each cell is idempotent via .done markers (same convention as the full
# phase scripts), so the chain can be resumed after interruption.
cd "$(dirname "$0")/.."
mkdir -p runs/round4
DEADLINE=${DEADLINE:-$(( $(date +%s) + 9000 ))}   # default: 2.5h from launch
export DEADLINE

left() { echo $(( DEADLINE - $(date +%s) )); }

{
  echo "### round-4 trimmed chain start $(date) (budget $(left)s)"

  bash scripts/run_round4_phaseA.sh

  # ---- B-trim: only the two +y cells at alpha=0.3 (100 epochs each)
  R=./runs/round4/rcgany_ablation
  mkdir -p $R
  common="--train --epoch 100 --batch_size 100 --compute_dtype bfloat16 \
    --data_dir $R/data --recover_epoch 1000 --disc_type projection \
    --spectral_norm --max_norm --noestimate_confuse --noaux_classifier \
    --algorithm rcgan"
  runb() {
    name=$1; shift
    if [ -f "$R/$name.done" ]; then echo "=== $name already done, skip"; return; fi
    if [ "$(left)" -lt 2300 ]; then echo "=== $name SKIPPED (out of budget)"; return; fi
    echo "=== $name start $(date +%H:%M:%S), $(left)s left ==="
    timeout 3000 python mnist_main.py $common --checkpoint_dir $R/$name "$@" \
      > $R/$name.txt 2>&1
    rc=$?
    echo "=== $name exit=$rc $(date +%H:%M:%S) ==="
    grep -E "EPOCH=(49|74|99),|label recovery|re-noising" $R/$name.txt | tail -6
    [ $rc -eq 0 ] && touch $R/$name.done
  }
  runb "concaty_a0.3" --alpha 0.3 --noadd_noise --concat_y --concat_y_layers 1
  runb "rcgany_a0.3"  --alpha 0.3 --add_noise --noise_alpha 0.15 \
       --noise_start 30 --noise_end 80 --concat_y --concat_y_layers 1

  # ---- C-trim: 25-epoch exploration sweep (5 cells), then best at the
  # largest budget that still fits the clock
  R=./runs/round4/rcganu_sweep
  mkdir -p $R
  commonc="--train --batch_size 100 --compute_dtype bfloat16 \
    --data_dir $R/data --recover_epoch 1000 --disc_type projection \
    --spectral_norm --max_norm --algorithm rcgan --alpha 0.3 \
    --estimate_confuse --aux_classifier --noadd_noise --noconcat_y"
  runc() {
    name=$1; ep=$2; shift 2
    if [ -f "$R/$name.done" ]; then echo "=== $name already done, skip"; return; fi
    need=$(( ep * 14 + 400 ))
    if [ "$(left)" -lt "$need" ]; then echo "=== $name SKIPPED (out of budget)"; return; fi
    echo "=== $name ($ep ep) start $(date +%H:%M:%S), $(left)s left ==="
    timeout $need python mnist_main.py $commonc --epoch $ep --checkpoint_dir $R/$name "$@" \
      > $R/$name.txt 2>&1
    rc=$?
    echo "=== $name exit=$rc $(date +%H:%M:%S) ==="
    grep -E "EPOCH=.*(accuracy|recovery)" $R/$name.txt | tail -4
    [ $rc -eq 0 ] && touch $R/$name.done
  }
  EP=25
  runc cm10_base $EP --confuse_multiplier 10 --perm_multiplier 10
  runc cm1       $EP --confuse_multiplier 1  --perm_multiplier 10
  runc cm10_diag $EP --confuse_multiplier 10 --perm_multiplier 10 --confuse_init --confuse_init_diag 0.2
  runc cm1_diag  $EP --confuse_multiplier 1  --perm_multiplier 10 --confuse_init --confuse_init_diag 0.2
  runc cm10_pm1  $EP --confuse_multiplier 10 --perm_multiplier 1

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
  cfg=$(ls $R/$best/*/config.json 2>/dev/null | head -1)
  args=$(python - "$cfg" <<'EOF'
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
  # best-cell budget: whatever epochs the remaining clock buys (cap 100)
  ep=$(( ($(left) - 500) / 15 ))
  [ "$ep" -gt 100 ] && ep=100
  if [ "$ep" -ge 40 ]; then
    runc "best_${ep}ep" $ep $args
  else
    echo "=== best-cell rerun SKIPPED (only $(left)s left)"
  fi

  echo "### round-4 trimmed chain done $(date) ($(left)s unused)"
} >> runs/round4/chain.log 2>&1
