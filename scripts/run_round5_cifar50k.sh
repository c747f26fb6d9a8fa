#!/bin/bash
# Round-5 phase A: all four CIFAR modes to the FULL 50,000-iteration
# reference budget (cifar10/gan_resnet.py:145 ITERS=50000) — the LR-decay
# floor region (gan_resnet.py:700-705, decay hits 0.5 exactly at 50k) has
# never been exercised by a committed run.  RCGAN-U runs first (the
# headline open question: does it close toward RCGAN's 0.90 once learned C
# converges?) and logs BOTH raw and permutation-corrected gen-label-acc
# (--perm_gen_label_acc, matching gan_resnet.py:1022-1029).
#
# Each run gets a deterministic --expt_dir so a tunnel outage + retry
# auto-resumes from the orbax checkpoint instead of restarting.
cd "$(dirname "$0")/.."
R=runs/round5
mkdir -p $R

probe_tunnel() {
  for i in $(seq 1 ${PROBES:-24}); do
    if timeout 120 python -c "
import jax, jax.numpy as jnp
assert jax.devices()[0].platform == 'tpu'
assert float(jnp.ones((8, 8)).sum()) == 64.0
" 2>/dev/null; then echo "tunnel alive (probe $i)"; return 0; fi
    sleep 120
  done
  return 1
}

run_one() {
  local algo=$1 name=$2; shift 2
  local expt="r5_${name}_50k"
  if [ -f "docs/runs/cifar_fullsize_${name}_50k/DONE" ]; then
    echo "### $name already archived; skipping"; return 0
  fi
  for attempt in 1 2 3; do
    probe_tunnel || { echo "### tunnel dead; aborting $name"; return 1; }
    echo "### $name attempt $attempt start $(date)"
    timeout 10800 python cifar_main.py --algorithm "$algo" --alpha 0.6 \
      --run "r5_${name}" --parent_dir $R --expt_dir "$expt" \
      --log_file $R/${name}.log --niters 50000 \
      --mesh_devices 1 --nomulti_gpu_multi_batch --compute_dtype bfloat16 \
      "$@"
    rc=$?
    echo "### $name attempt $attempt exit=$rc $(date)"
    [ $rc -eq 0 ] && break
    sleep 60
  done
  [ $rc -ne 0 ] && return 1
  local dest=docs/runs/cifar_fullsize_${name}_50k
  bash scripts/archive_cifar_run.sh "$R/$expt" $R/${name}.log "$dest" || true
  grep -E "learned-C recovery|gen-label-acc raw" $R/${name}.log \
    > "$dest/c_recovery.log" 2>/dev/null || true
  [ -s "$dest/c_recovery.log" ] || rm -f "$dest/c_recovery.log"
  touch "$dest/DONE"
  return 0
}

{
  echo "##### round-5 CIFAR 50k chain start $(date)"
  run_one rcgan-u rcganu --perm_classifier --confuse_init --perm_gen_label_acc
  run_one rcgan   rcgan
  run_one biased  biased
  run_one unbiased unbiased
  echo "##### round-5 CIFAR 50k chain done $(date)"
} >> $R/chain.log 2>&1
