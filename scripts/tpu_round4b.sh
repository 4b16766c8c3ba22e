#!/bin/bash
# Round-4 follow-up TPU measurements (run AFTER scripts/tpu_round4.sh):
#  - potlatch/raven-moot solo re-measure: bench_games found potlatch 4.2x
#    slow despite HLO isomorphic to raven-moot and identical episode
#    counts — confirm (or refute) the relay-artifact explanation.
#  - GROUP_STMTS-ON solo headline: the interleaved A/B showed +0.9% on
#    werewolf, noise on storm-forge; a solo bench decides the default.
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
run regames 1800 python -m game_engine_tpu.utils.bench_games 4096 1024 7 \
    potlatch raven-moot werewolf
run grouped_solo 1200 python -c "
import game_engine_tpu.core.step as S
S.GROUP_STMTS = True
import runpy, sys
sys.argv = ['bench.py', '4096', '1024', '16']
runpy.run_path('bench.py', run_name='__main__')
"
echo "ALL DONE-4B $(date -u)"
