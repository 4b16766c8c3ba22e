"""Same-session A/B: generic 3-reduce argbest vs range-packed 1-reduce.

Round-5 follow-up to the ab_ireffects kill-program decomposition
(docs/PERF.md): the packed emission (`step._EffectOps.argbest_ranged`)
replaces the generic argbest on every analyzer plurality. This harness
answers whether the rewrite moves the measured step time ON CHIP, under
the PERF.md measurement-hygiene rule: both variants traced, compiled and
run interleaved in ONE process, hard host sync per iteration.

Usage: python -m game_engine_tpu.utils.ab_argbest [batch] [steps] [iters]
"""

import statistics
import sys
import time

import numpy as np


def main() -> None:
    import jax

    import game_engine_tpu.core.step as S
    from game_engine_tpu.core.engine import make_rollout
    from game_engine_tpu.core.state import init_state
    from game_engine_tpu.gamespec.compile import compile_game
    from game_engine_tpu.gamespec.parser import load_builtin
    from game_engine_tpu.gamespec.tables import lower

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    lowered = lower(compile_game(load_builtin("werewolf")))
    st0 = init_state(lowered, B, 6, np.arange(B, dtype=np.uint32))

    # trace the GENERIC build with the ranged emission disabled (the
    # effects executor falls back when the ops object lacks the method)
    saved = S._EffectOps.argbest_ranged
    del S._EffectOps.argbest_ranged
    roll_generic = jax.jit(make_rollout(lowered, STEPS, auto_reset=True))
    st_g, eps = roll_generic(st0)
    jax.block_until_ready(eps)
    S._EffectOps.argbest_ranged = saved
    roll_ranged = jax.jit(make_rollout(lowered, STEPS, auto_reset=True))
    st_r, eps = roll_ranged(st0)
    jax.block_until_ready(eps)
    print("compiled both variants", flush=True)

    rolls = {"generic": roll_generic, "ranged": roll_ranged}
    states = {"generic": st_g, "ranged": st_r}
    ts: dict = {"generic": [], "ranged": []}
    ep = {"generic": 0, "ranged": 0}
    # ABBA interleave kills slow relay drift
    for name in ["generic", "ranged", "ranged", "generic"] * ITERS:
        t0 = time.perf_counter()
        states[name], eps = rolls[name](states[name])
        jax.block_until_ready(eps)
        ts[name].append(time.perf_counter() - t0)
        ep[name] += int(jax.numpy.sum(eps))
    for name in ("generic", "ranged"):
        med = statistics.median(ts[name])
        print(
            f"{name}: median_iter={med * 1e3:.1f}ms "
            f"steps/s={B * STEPS / med / 1e6:.1f}M "
            f"iters={len(ts[name])} episodes={ep[name]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
