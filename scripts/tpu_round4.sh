#!/bin/bash
# Round-4 TPU measurement queue — run serially (ONE TPU client at a time,
# CLAUDE.md). Each step logs to docs/r4_tpu_runs/ and continues on failure.
# Launched by the relay watcher the moment the axon backend answers.
cd /root/repo
OUT=docs/r4_tpu_runs
mkdir -p "$OUT"
run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S) ==="
  timeout "$tmo" "$@" 2>&1 | tee "$OUT/$name.log"
  echo "=== $name exit $? $(date -u +%H:%M:%S) ==="
}
# 1. headline confirm @4096 (first post-write-combining driver-comparable number)
run bench_4096 2400 python bench.py 4096 1024 16
# 2. write-combining A/B (VERDICT #2 lever measurement)
run ab_writes 2400 python -m game_engine_tpu.utils.ab_writes 4096 1024 16
# 3. per-game breadth incl. the five IR-only games + storm-forge (VERDICT #7)
run bench_games 3600 python -m game_engine_tpu.utils.bench_games 4096 1024 5
# 4. 65k-room headline
run bench_65k 2400 python bench.py 65536 256 16
# 5. grounded+persona chat LM retrain (VERDICT #6) — lands beside the old
#    checkpoint; promoted manually after metrics review
run chat_lm_r4 5400 python -m game_engine_tpu.train.chat_lm --steps 3000 \
    --out docs/checkpoints/chat_lm_r4.npz
# 6. async learner A/B (VERDICT #8)
run ab_async 3600 python -m game_engine_tpu.utils.ab_async 8192 16 2 16 attn
# 7. policy-in-the-loop headline
run bench_policy 2400 python bench.py --policy 16384 128 4
echo "ALL DONE $(date -u)"
