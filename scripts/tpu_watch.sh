#!/bin/bash
# Probe the axon TPU relay every 5 min; fire the round-4 queue when healthy.
cd /root/repo
mkdir -p docs/r4_tpu_runs
while true; do
  if timeout 120 python -c "import jax; jax.devices()" > /dev/null 2>&1; then
    echo "TPU healthy at $(date -u)" >> docs/r4_tpu_runs/watch.log
    bash scripts/tpu_round4.sh >> docs/r4_tpu_runs/runner.log 2>&1
    echo "queue finished at $(date -u)" >> docs/r4_tpu_runs/watch.log
    break
  fi
  echo "TPU down at $(date -u)" >> docs/r4_tpu_runs/watch.log
  sleep 300
done
