#!/bin/bash
# Round-5 phase C2 (queued behind phase B): serving latency/throughput
# bench on the real chip.  The original phase C targeted the 50k RCGAN
# checkpoint, but the box reset wiped runs/ — serving perf is weight-value
# independent, so this variant saves a fresh init-state checkpoint at the
# exact flagship shape (scripts/make_serving_ckpt.py) and benches that.
# -> docs/perf/serving_latency_r5.json
#
# Usage: WAIT_PID=<phase B pid> bash scripts/run_round5_phaseC2.sh
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

{
  echo "##### round-5 phase C2 start $(date)"
  if [ -n "$WAIT_PID" ]; then
    echo "waiting for pid $WAIT_PID to release the chip..."
    while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
    echo "pid $WAIT_PID exited at $(date +%H:%M:%S)"
  fi
  probe_tunnel || { echo "### tunnel dead; phase C2 aborted"; exit 1; }

  echo "=== make ckpt $(date +%H:%M:%S) ==="
  timeout 900 python scripts/make_serving_ckpt.py $R/serving_ckpt 256 \
    > $R/make_ckpt.txt 2>&1
  echo "make ckpt exit=$?"
  tail -2 $R/make_ckpt.txt

  echo "=== serving bench $(date +%H:%M:%S) ==="
  timeout 2400 python scripts/bench_serving.py \
    --checkpoint $R/serving_ckpt/ckpt --model cifar \
    --buckets 1,8,64,256 --reqs 50 --threads 8 --req_size 10 --secs 10 \
    --out docs/perf/serving_latency_r5.json > $R/serving_bench.txt 2>&1
  echo "serving bench exit=$?"
  tail -12 $R/serving_bench.txt
  echo "##### round-5 phase C2 done $(date)"
} >> $R/phaseC2.log 2>&1
