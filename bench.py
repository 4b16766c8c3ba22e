#!/usr/bin/env python
"""Headline benchmark: env steps/sec/chip on 4096-room batched Werewolf.

Matches BASELINE.json's north star: >= 1,000,000 env steps/sec/chip with
bit-identical semantics to the oracle interpreter (enforced separately by
tests/test_parity.py). The reference interpreter's implied rate is
O(0.01-0.1) phase-steps/sec/room (4 sequential LLM round trips per turn,
BASELINE.md), so vs_baseline here is reported against the 1M/s/chip target.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from game_engine_tpu.core.engine import compiled_rollout
    from game_engine_tpu.core.state import init_state
    from game_engine_tpu.gamespec.compile import compile_game
    from game_engine_tpu.gamespec.parser import load_builtin
    from game_engine_tpu.gamespec.tables import lower

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    inner_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    lowered = lower(compile_game(load_builtin("werewolf")))
    rollout = compiled_rollout(lowered, inner_steps, auto_reset=True)

    seeds = np.arange(batch, dtype=np.uint32)
    state = init_state(lowered, batch, 8, seeds)

    # warmup + compile (int() forces a real host sync on every path)
    state, eps = rollout(state)
    _ = int(eps)

    t0 = time.perf_counter()
    total_eps = 0
    for _ in range(iters):
        state, eps = rollout(state)
        total_eps += int(eps)  # hard host sync each iteration
    dt = time.perf_counter() - t0

    steps = batch * inner_steps * iters
    sps = steps / dt
    print(
        json.dumps(
            {
                "metric": "env_steps_per_sec_per_chip_werewolf_4096rooms",
                "value": round(sps, 1),
                "unit": "steps/s",
                "vs_baseline": round(sps / 1_000_000, 3),
                "detail": {
                    "batch_rooms": batch,
                    "inner_steps": inner_steps,
                    "iters": iters,
                    "wall_s": round(dt, 3),
                    "episodes_completed": total_eps,
                    "episodes_per_sec": round(total_eps / dt, 1),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
