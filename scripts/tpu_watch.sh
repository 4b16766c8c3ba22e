#!/bin/bash
# Probe the axon TPU relay every 5 min; fire the round-4 queue when healthy.
# The queue skips already-captured steps, so a flapping relay gets up to 3
# queue attempts, re-waiting for health between them.
cd /root/repo
mkdir -p docs/r4_tpu_runs
attempts=0
while [ "$attempts" -lt 3 ]; do
  if timeout 120 python -c "import jax; jax.devices()" > /dev/null 2>&1; then
    attempts=$((attempts + 1))
    echo "TPU healthy at $(date -u) — queue attempt $attempts" >> docs/r4_tpu_runs/watch.log
    bash scripts/tpu_round4.sh >> docs/r4_tpu_runs/runner.log 2>&1
    echo "queue attempt $attempts finished at $(date -u)" >> docs/r4_tpu_runs/watch.log
    if grep -q "ALL DONE" docs/r4_tpu_runs/runner.log && \
       [ -f docs/r4_tpu_runs/bench_4096.ok ] && \
       [ -f docs/r4_tpu_runs/bench_65k.ok ]; then
      echo "queue complete with headline captures at $(date -u)" >> docs/r4_tpu_runs/watch.log
      break
    fi
    sleep 60
  else
    echo "TPU down at $(date -u)" >> docs/r4_tpu_runs/watch.log
    sleep 300
  fi
done
