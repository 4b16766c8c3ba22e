#!/bin/bash
# Round-4 TPU measurement queue — run serially (ONE TPU client at a time,
# CLAUDE.md). Each step logs to docs/r4_tpu_runs/ and continues on failure.
# Launched by the relay watcher when the axon backend answers; steps whose
# log already holds a JSON result line are SKIPPED, so a flapping relay
# can resume the queue without repeating finished measurements.
cd /root/repo
OUT=docs/r4_tpu_runs
mkdir -p "$OUT"
# A step is captured only when its harness EXITED 0 with a JSON line in
# the log — marked by a .ok file. Grepping the log alone is not enough:
# bench_games prints one JSON row PER GAME and the trainer prints step
# logs, so a relay flap mid-run would otherwise mark a half-finished
# step "captured" and skip its remainder forever.
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
# 1. headline confirm @4096 (first post-write-combining driver-comparable number)
run bench_4096 2400 python bench.py 4096 1024 16
# 2. write-combining A/B incl. the sorted-flush + grouped variants
#    (VERDICT #2 lever) — werewolf (the headline program), then
#    storm-forge (the ~40-statement program where statement grouping has
#    the most room to matter)
run ab_writes 2400 python -m game_engine_tpu.utils.ab_writes 4096 1024 16
run ab_writes_storm 2400 python -m game_engine_tpu.utils.ab_writes 4096 512 16 storm-forge
# 3. per-game breadth incl. the five IR-only games + storm-forge +
#    masquerade-gala's ST_DEAL hot path (VERDICT #7)
run bench_games 3600 python -m game_engine_tpu.utils.bench_games 4096 1024 5
# 4. 65k-room headline
run bench_65k 2400 python bench.py 65536 256 16
# 5. policy-in-the-loop headline
run bench_policy 2400 python bench.py --policy 16384 128 4
# 6. async learner A/B (VERDICT #8)
run ab_async 3600 python -m game_engine_tpu.utils.ab_async 8192 16 2 16 attn
# 7. LAST (longest TPU hold, ~90 min): grounded+persona+v2 chat LM
#    retrain (VERDICT #6) — lands beside the old checkpoint; promoted
#    manually after metrics review. Running it last means a flapping
#    relay (or a driver bench capture colliding with the queue) costs
#    the short high-value measurements nothing.
if [ -f docs/checkpoints/chat_lm_r4.metrics.json ]; then
  echo "=== chat_lm_r4 already captured (metrics file), skipping ==="
else
  run chat_lm_r4 5400 python -m game_engine_tpu.train.chat_lm --steps 3000 \
      --out docs/checkpoints/chat_lm_r4.npz
fi
echo "ALL DONE $(date -u)"
