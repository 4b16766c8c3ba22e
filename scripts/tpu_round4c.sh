#!/bin/bash
# Round-4 fused-kernel TPU measurements (run when the relay returns):
#  - ab_fused attn: the "make the update itself cheaper" lever — fused
#    Pallas fwd+bwd policy-net kernels vs the XLA path, one process
#    (docs/PERF.md "Where the attn update's time actually goes" says the
#    XLA update is ~10-15x off roofline on HBM round-trips).
#  - ab_fused deepsets: same kernels on the cheaper arch (the win should
#    be smaller; deepsets' update is closer to dispatch-bound).
#  - fused_train: a short real train.run --fused sustained-rate confirm
#    (the A/B measures programs; this measures the product path).
# Same .ok resume discipline as tpu_round4.sh.
cd /root/repo
OUT=docs/r4_tpu_runs
mkdir -p "$OUT"
run() {
  name=$1; tmo=$2; shift 2
  if [ -f "$OUT/$name.ok" ]; then
    echo "=== $name already captured, skipping ==="
    return 0
  fi
  echo "=== $name start $(date -u +%H:%M:%S) ==="
  timeout "$tmo" "$@" 2>&1 | tee "$OUT/$name.log"
  rc=${PIPESTATUS[0]}
  echo "=== $name exit $rc $(date -u +%H:%M:%S) ==="
  if [ "$rc" -eq 0 ] && grep -qE '^\{.*\}$' "$OUT/$name.log"; then
    touch "$OUT/$name.ok"
  fi
}
run ab_fused_attn 2400 python -m game_engine_tpu.utils.ab_fused 8192 16 2 16 attn
run ab_fused_deepsets 1800 python -m game_engine_tpu.utils.ab_fused 8192 16 2 16 deepsets
run fused_train 1800 python -m game_engine_tpu.train.run --batch 8192 --updates 12 \
    --horizon 16 --epochs 2 --arch attn --fused
echo "ALL DONE-4C $(date -u)"
