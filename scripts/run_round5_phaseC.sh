#!/bin/bash
# Round-5 phase C (queued behind phase B): serving latency/throughput
# bench against the full-50k RCGAN checkpoint on the real chip ->
# docs/perf/serving_latency_r5.json.
#
# Usage: WAIT_PID=<phase B pid> bash scripts/run_round5_phaseC.sh
cd "$(dirname "$0")/.."
R=runs/round5

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
  echo "##### round-5 phase C start $(date)"
  if [ -n "$WAIT_PID" ]; then
    echo "waiting for pid $WAIT_PID to release the chip..."
    while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
    echo "pid $WAIT_PID exited at $(date +%H:%M:%S)"
  fi
  probe_tunnel || { echo "### tunnel dead; phase C aborted"; exit 1; }

  echo "=== serving bench $(date +%H:%M:%S) ==="
  timeout 2400 python scripts/bench_serving.py \
    --checkpoint $R/r5_rcgan_50k/checkpoint --model cifar \
    --buckets 1,8,64,256 --reqs 50 --threads 8 --req_size 10 --secs 10 \
    --out docs/perf/serving_latency_r5.json > $R/serving_bench.txt 2>&1
  echo "serving bench exit=$?"
  tail -8 $R/serving_bench.txt
  echo "##### round-5 phase C done $(date)"
} >> $R/phaseC.log 2>&1
