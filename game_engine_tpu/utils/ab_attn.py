"""A/B: where does the attn arch's training wall-clock go, and does
chunking the loss remat close its gap to deepsets?

VERDICT r2 (weak #7): attn trains at 105-113K env-steps/s vs deepsets
405K despite 10x the sample efficiency. Hypothesis: the learner loss
recompute runs `lax.map` ONE timestep at a time (the memory-safe default),
so the backward pass pays T sequential dispatch rounds of small kernels —
and the attention block multiplies the kernel count per round. The
`PPOConfig.loss_chunk` knob groups C timesteps per remat chunk; this
harness measures, interleaved in ONE process (axon drift ±10% across
processes), for deepsets and attn:

  - rollout-only wall (the unroll scan, policy in the loop)
  - full train_step wall at loss_chunk in {1, 2, 4, 8, T}

    python -m game_engine_tpu.utils.ab_attn [batch] [horizon] [epochs] [iters]
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    import optax

    from game_engine_tpu.core.state import init_state
    from game_engine_tpu.gamespec.compile import compile_game
    from game_engine_tpu.gamespec.parser import load_builtin
    from game_engine_tpu.gamespec.tables import lower
    from game_engine_tpu.policies import net as N
    from game_engine_tpu.train.ppo import (PPOConfig, init_training,
                                           make_train_step, make_unroll)

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    horizon = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 8

    lowered = lower(compile_game(load_builtin("werewolf")))
    state0 = init_state(lowered, batch, 8, np.arange(batch, dtype=np.uint32))
    if len(sys.argv) > 5:  # comma-separated chunk list override
        chunks = [int(c) for c in sys.argv[5].split(",")]
    else:
        chunks = sorted({c for c in (1, 2, 4, 8, horizon) if c <= horizon})

    def sync(out):
        # HARD host sync: under the axon relay block_until_ready returns
        # before the device work drains (bogus-fast timings, CLAUDE.md);
        # fetching a scalar element forces real completion
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(jnp.asarray(leaf).ravel()[0])

    def med(fn, *args):
        sync(fn(*args))  # compile + warm
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            sync(fn(*args))
            times.append(time.perf_counter() - t0)
        times.sort()
        return times[len(times) // 2]

    results = {"batch": batch, "horizon": horizon, "epochs": epochs}
    key = jax.random.PRNGKey(0)
    for arch in ("deepsets", "attn"):
        cfg0 = PPOConfig(horizon=horizon, epochs=epochs,
                         net=N.NetConfig(hidden=256, arch=arch))
        params, opt_state, tx = init_training(lowered, cfg0, key)

        unroll = jax.jit(make_unroll(lowered, cfg0))
        t = med(unroll, params, state0, key)
        results[f"{arch}_rollout_env_steps_per_s"] = round(batch * horizon / t)

        for c in chunks:
            for remat in ("full", "dots"):
                cfg = PPOConfig(horizon=horizon, epochs=epochs, loss_chunk=c,
                                remat=remat,
                                net=N.NetConfig(hidden=256, arch=arch))
                step = jax.jit(make_train_step(lowered, cfg, tx))
                tag = f"{arch}_train_chunk{c}" + ("_dots" if remat == "dots" else "")
                try:
                    t = med(step, params, opt_state, state0, key)
                except Exception as e:  # XLA OOM at big chunks is a data point
                    results[tag] = f"failed: {type(e).__name__}"
                    continue
                results[f"{tag}_env_steps_per_s"] = round(batch * horizon / t)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
