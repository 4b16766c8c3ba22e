"""A/B: per-phase program specialization — the last unmeasured perf lever.

ROADMAP r2 dismissed grouped-by-phase dispatch "on paper"; VERDICT r2
(weak #6) requires the measurement. The question: if the engine KNEW every
room's current phase at compile time (the upper bound any grouped-dispatch
scheme could reach before paying for regrouping), how much cheaper is the
step program?

Method (interleaved in ONE process — separate bench invocations drift
±10% under the axon relay): the baseline step vs a specialized step whose
`state.phase` is pinned to a compile-time constant, so every per-phase
table select, branch chain and record mask folds away in XLA. Both run the
same K-step scan with the same scripted policy on the same warmed state.

    python -m game_engine_tpu.utils.ab_specialize [batch] [K] [iters]
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    from game_engine_tpu.core.engine import scripted_actions
    from game_engine_tpu.core.state import init_state
    from game_engine_tpu.core.step import make_step
    from game_engine_tpu.gamespec.compile import compile_game
    from game_engine_tpu.gamespec.parser import load_builtin
    from game_engine_tpu.gamespec.tables import lower

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    lowered = lower(compile_game(load_builtin("werewolf")))
    base_step = make_step(lowered)

    def scan_of(step_fn):
        def run(state):
            def body(st, _):
                nxt = step_fn(st, scripted_actions(lowered, st))
                return nxt, ()

            state, _ = jax.lax.scan(body, state, None, length=K)
            return state

        return jax.jit(run)

    def specialized(phase_idx: int):
        def step(state, actions):
            # the compile-time pin: XLA folds every phase-indexed select
            pinned = state._replace(
                phase=jnp.full_like(state.phase, phase_idx))
            return base_step(pinned, actions)

        return step

    # a mixed-phase state: staggered seeds run 40 steps so rooms desync
    state0 = init_state(lowered, batch, 8, np.arange(batch, dtype=np.uint32))
    warm = scan_of(base_step)
    state0 = warm(state0)
    jax.block_until_ready(state0)
    phases = np.asarray(state0.phase)
    hist = {int(p): int((phases == p).sum()) for p in np.unique(phases)}

    def bench(run, state):
        run(state)  # compile + warm
        jax.block_until_ready(run(state))
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            jax.block_until_ready(run(state))
            times.append(time.perf_counter() - t0)
        times.sort()
        med = times[len(times) // 2]
        return med / K * 1e6  # us per step

    results = {"phase_histogram": hist, "batch": batch, "K": K}
    results["baseline_us_per_step"] = round(bench(scan_of(base_step), state0), 2)

    # specialize for the three structurally distinct phase classes: a night
    # action phase, the branch-heavy win-check hub, and a resolution phase
    # carrying mechanics — whichever dense indices those map to here
    interesting = []
    for i in range(lowered.NP):
        is_action = bool(lowered.phase_is_action[i])
        n_branch = len(lowered.branches[i])
        n_mech = sum(1 for m in lowered.mechanics if m.phase_index == i)
        interesting.append((i, is_action, n_branch, n_mech))
    picks = []
    picks.append(next(i for i, a, b, m in interesting if a))  # action
    picks.append(max(interesting, key=lambda t: t[2])[0])  # most branches
    picks.append(max(interesting, key=lambda t: t[3])[0])  # most mechanics
    for i in dict.fromkeys(picks):
        run = scan_of(specialized(i))
        results[f"specialized_phase{i}_us_per_step"] = round(bench(run, state0), 2)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
