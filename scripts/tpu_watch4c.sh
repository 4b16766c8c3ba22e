#!/bin/bash
# Probe the axon TPU relay every 5 min; fire the round-4c fused-kernel
# queue when healthy. Same retry discipline as scripts/tpu_watch.sh.
cd /root/repo
mkdir -p docs/r4_tpu_runs
attempts=0
while [ "$attempts" -lt 4 ]; do
  if timeout 120 python -c "import jax; jax.devices()" > /dev/null 2>&1; then
    attempts=$((attempts + 1))
    echo "TPU healthy at $(date -u) — 4c queue attempt $attempts" >> docs/r4_tpu_runs/watch.log
    bash scripts/tpu_round4c.sh >> docs/r4_tpu_runs/runner.log 2>&1
    echo "4c queue attempt $attempts finished at $(date -u)" >> docs/r4_tpu_runs/watch.log
    if [ -f docs/r4_tpu_runs/ab_fused_attn.ok ] && \
       [ -f docs/r4_tpu_runs/ab_fused_deepsets.ok ] && \
       [ -f docs/r4_tpu_runs/fused_train.ok ]; then
      echo "4c queue complete at $(date -u)" >> docs/r4_tpu_runs/watch.log
      break
    fi
    sleep 60
  else
    echo "TPU down at $(date -u) [4c watch]" >> docs/r4_tpu_runs/watch.log
    sleep 300
  fi
done
