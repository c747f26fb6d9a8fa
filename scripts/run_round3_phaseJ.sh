#!/bin/bash
# Round-3 phase J (optional, after I+H): progressive schedule to 128x128
# (ROADMAP #7 / VERDICT r2 item 8 extended) — max_stage 5 on natively
# rendered 128px synthetic data, conditional critic, per-stage pinned
# evals.  The model/app are resolution-agnostic (proven at tiny dims by
# tests/test_pggan.py::test_stage5_128px_schedule); this produces the
# on-chip evidence row.  Batch 32 + shorter phases keep the top stage
# within the VMEM/time envelope of the tunneled v5e.
#
# The exact invocation path (app CLI -> 128px synthetic data -> 5-stage
# schedule -> per-stage pinned evals -> stage_accuracy.json) was
# dry-run end-to-end on CPU at dim 8 / 2+2 iters during the 2026-08-18
# tunnel outage: exit 0, all 9 phase rows + final accuracy table
# emitted.  Only the training budget differs here.
cd "$(dirname "$0")/.."
R=${RUNS:-./runs/round3}
mkdir -p $R

echo "=== pggan128_cond start $(date +%H:%M:%S) ==="
timeout 12000 python -m rcgan_tpu.apps.pggan_app --run_dir $R/pggan128_cond \
  --size 128 --max_stage 5 --dim 128 --z_dim 128 --batch_size 32 \
  --trans_iters 1000 --stab_iters 1000 --train_size 20000 --conditional \
  > $R/pggan128_cond.txt 2>&1
echo "=== pggan128_cond exit=$? $(date +%H:%M:%S) ==="
grep -E "gen_label_acc|accuracy table" $R/pggan128_cond.txt | tail -10
echo "=== phase J complete $(date +%H:%M:%S) ==="
