"""A/B: what does the effect-IR interpreter cost in the werewolf hot loop?

The P6/P7 migration routes night resolution and vote elimination through
the generic LEffect interpreter; the headline bench moved ~86M -> ~29M
steps/s. This harness isolates the interpreter's share by interleaving,
in ONE process (axon drift discipline, docs/PERF.md):

  ir      the real step (LEffect programs executed)
  noop    identical program with the LEffect handler stubbed out
          (semantics wrong, shapes identical — timing control)

    python -m game_engine_tpu.utils.ab_ireffects [batch] [steps] [iters]
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    from game_engine_tpu.core import step as S
    from game_engine_tpu.core.engine import compiled_rollout
    from game_engine_tpu.core.state import init_state
    from game_engine_tpu.gamespec import tables as T
    from game_engine_tpu.gamespec.compile import compile_game
    from game_engine_tpu.gamespec.parser import load_builtin
    from game_engine_tpu.gamespec.tables import lower

    from game_engine_tpu.core import effects_exec as FXE

    # default 1024-step scans: shorter scans read ~3x slow from per-iter
    # relay-sync amortization (docs/PERF.md), not device time
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    lowered = lower(compile_game(load_builtin("werewolf")))

    # the noop control must stub BOTH entry points: single-block programs
    # route through run_effects_merged (step.apply_on_enter), multi-block
    # ones through the _MECH_FNS dispatch
    real_fx = S._MECH_FNS[T.LEffect]
    real_merged = FXE.run_effects_merged

    def med(roll):
        # fresh state per variant: compiled_rollout donates its input
        st, eps = roll(init_state(lowered, batch, 8,
                                  np.arange(batch, dtype=np.uint32)))
        _ = int(eps)  # hard host sync
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            st, eps = roll(st)
            _ = int(eps)
            times.append(time.perf_counter() - t0)
        times.sort()
        return times[len(times) // 2]

    results = {"batch": batch, "steps": steps, "iters": iters}

    from game_engine_tpu.gamespec import effects as FX

    def _has_stmt(mech, skinds) -> bool:
        return any(s[0] in skinds for _nodes, stmts in mech.blocks
                   for s in stmts)

    def _selective(skip_pred):
        """(fx, merged) pair stubbing exactly the programs skip_pred
        matches — per-program cost attribution."""
        def fx(lw, st, active, m):
            return st if skip_pred(m) else real_fx(lw, st, active, m)

        def merged(mechs, ops, actives):
            keep = [(m, a) for m, a in zip(mechs, actives)
                    if not skip_pred(m)]
            if keep:
                real_merged([m for m, _ in keep], ops,
                            [a for _, a in keep])
        return fx, merged

    nodeal = _selective(lambda m: _has_stmt(m, {FX.ST_DEAL}))
    nokill = _selective(lambda m: _has_stmt(m, {FX.ST_KILL}))
    noover = _selective(lambda m: _has_stmt(m, {FX.ST_OVER}))
    variants = [
        ("ir", real_fx, real_merged),
        ("noop", lambda lw, st, active, m: st,
         lambda mechs, ops, actives: None),
        ("nodeal", *nodeal),    # role-deal programs stubbed
        ("nokill", *nokill),    # night/vote kill programs stubbed
        ("noover", *noover),    # terminal-rule programs stubbed
        ("ir2", real_fx, real_merged),  # re-run: drift control
    ]
    for name, fn, merged in variants:
        S._MECH_FNS[T.LEffect] = fn
        FXE.run_effects_merged = merged
        roll = compiled_rollout(lowered, steps, auto_reset=True)
        t = med(roll)
        results[f"{name}_us_per_step"] = round(t / steps * 1e6, 1)
        results[f"{name}_env_steps_per_s"] = round(batch * steps / t)
    S._MECH_FNS[T.LEffect] = real_fx
    FXE.run_effects_merged = real_merged
    print(json.dumps(results))


if __name__ == "__main__":
    main()
