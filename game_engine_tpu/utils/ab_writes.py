"""A/B: effect-IR write-combining (deferred per-slot flush) vs
per-statement dynamic-update-slice writes.

Round-4 lever for the interpreter's ~11% single-chip residual
(docs/PERF.md): per-statement `.at[slot].set` chains extend the banks'
live ranges and hand XLA one DUS per statement; the deferred mode
(core/step.py DEFERRED_WRITES) accumulates each slot's statement-ordered
select chain and lands ONE update per touched slot at block end.
Bit-identity is pinned by tests/fixtures/golden_oracle.json.

Both variants build in ONE process with interleaved timed loops (axon
drift discipline — see docs/PERF.md measurement hygiene).

    python -m game_engine_tpu.utils.ab_writes [batch] [steps] [iters] [game]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> None:
    from game_engine_tpu.core import step as S
    from game_engine_tpu.core.engine import compiled_rollout
    from game_engine_tpu.core.state import init_state
    from game_engine_tpu.gamespec.compile import compile_game
    from game_engine_tpu.gamespec.parser import load_builtin
    from game_engine_tpu.gamespec.tables import lower

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    game = sys.argv[4] if len(sys.argv) > 4 else "werewolf"

    lowered = lower(compile_game(load_builtin(game)))

    def build(deferred: bool, sorted_flush: bool = False,
              group_stmts: bool = False):
        S.DEFERRED_WRITES = deferred
        S.SORTED_FLUSH = sorted_flush
        S.GROUP_STMTS = group_stmts
        roll = compiled_rollout(lowered, steps, auto_reset=True)
        st, eps = roll(init_state(lowered, batch, 8,
                                  np.arange(batch, dtype=np.uint32)))
        _ = int(eps)  # hard host sync; also forces the jit build now
        return roll, st

    print("building deferred…", flush=True)
    roll_d, st_d = build(True)
    print("building deferred+sorted-flush…", flush=True)
    roll_s, st_s = build(True, sorted_flush=True)
    print("building deferred+grouped-stmts…", flush=True)
    roll_g, st_g = build(True, group_stmts=True)
    print("building per-statement…", flush=True)
    roll_p, st_p = build(False)
    S.DEFERRED_WRITES = True
    S.SORTED_FLUSH = False
    S.GROUP_STMTS = False

    states = {"deferred": st_d, "sorted": st_s, "grouped": st_g,
              "per_stmt": st_p}
    rolls = {"deferred": roll_d, "sorted": roll_s, "grouped": roll_g,
             "per_stmt": roll_p}
    times = {name: [] for name in rolls}
    for i in range(iters):
        for name, roll in rolls.items():
            t0 = time.perf_counter()
            st, eps = roll(states[name])
            _ = int(eps)
            times[name].append(time.perf_counter() - t0)
            states[name] = st
        print(f"iter {i}: " + " ".join(
            f"{n[0]}={times[n][-1]:.3f}s" for n in rolls), flush=True)

    out = {"batch": batch, "steps": steps, "iters": iters, "game": game}
    for name, ts in times.items():
        ts = sorted(ts)
        med = ts[len(ts) // 2]
        out[f"{name}_us_per_step"] = round(med / steps * 1e6, 1)
        out[f"{name}_env_steps_per_s"] = round(batch * steps / med)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
