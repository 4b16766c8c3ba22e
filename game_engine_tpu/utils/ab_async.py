"""A/B: pipelined (async, 1-stale) PPO vs the sync fused train step.

VERDICT r3 #8 asked for rollout/update overlap for the attn arch — or a
measured-dead writeup with interleaved A/B rigor. This harness measures,
in ONE process (axon drift discipline):

  sync        make_train_step: unroll+GAE+epochs fused in one program
  pipe1       train.pipeline on ONE device: same math split into two
              programs with one-update staleness (the overlap control —
              a single chip runs kernels serially, so any delta here is
              program-splitting overhead, not overlap)
  rollout / update   each stage alone (the r and u of the pipeline
              algebra: pipeline rate = 1/max(r,u) vs DP's 2/(r+u))
  pipe2       (only when >=2 devices are visible) the two-device overlap

    python -m game_engine_tpu.utils.ab_async [batch] [horizon] [epochs] \
        [iters] [arch]
"""

from __future__ import annotations

import json
import sys
import time

import jax
import numpy as np


def main() -> None:
    from game_engine_tpu.core.state import init_state
    from game_engine_tpu.gamespec.compile import compile_game
    from game_engine_tpu.gamespec.parser import load_builtin
    from game_engine_tpu.gamespec.tables import lower
    from game_engine_tpu.policies import net as N
    from game_engine_tpu.train.pipeline import make_pipeline, run_pipelined
    from game_engine_tpu.train.ppo import (PPOConfig, init_training,
                                           make_train_step, make_unroll)

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    horizon = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 16
    arch = sys.argv[5] if len(sys.argv) > 5 else "attn"

    lowered = lower(compile_game(load_builtin("werewolf")))
    cfg = PPOConfig(horizon=horizon, epochs=epochs,
                    net=N.NetConfig(hidden=256, arch=arch))
    key = jax.random.PRNGKey(0)
    params, opt_state, tx = init_training(lowered, cfg, key)
    state0 = init_state(lowered, batch, 8, np.arange(batch, dtype=np.uint32))

    def sync_scalar(x):
        return float(jax.numpy.asarray(x).ravel()[0])  # hard host sync

    results = {"batch": batch, "horizon": horizon, "epochs": epochs,
               "arch": arch, "iters": iters,
               "n_devices": jax.device_count()}

    # --- stage-alone rates (r and u) -------------------------------------
    unroll = jax.jit(make_unroll(lowered, cfg))
    collect, update = make_pipeline(lowered, cfg, tx)
    st, ky, traj, lobs = collect(params, state0, key)
    sync_scalar(traj.reward)

    def timed(fn, n=iters):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    sync_scalar(unroll(params, state0, key)[2].reward)  # warm
    r = timed(lambda: sync_scalar(unroll(params, state0, key)[2].reward))
    results["rollout_s"] = round(r, 4)
    results["rollout_env_steps_per_s"] = round(batch * horizon / r)

    p2, o2, m = update(params, opt_state, traj, lobs)  # warm
    sync_scalar(m["loss"])
    u = timed(lambda: sync_scalar(update(params, opt_state, traj, lobs)[2]["loss"]))
    results["update_s"] = round(u, 4)
    results["pipeline_bound_env_steps_per_s"] = round(
        batch * horizon / max(r, u))

    # --- sync fused step --------------------------------------------------
    step = jax.jit(make_train_step(lowered, cfg, tx))
    out = step(params, opt_state, state0, key)  # warm/compile
    sync_scalar(out[4]["loss"])
    t = timed(lambda: sync_scalar(step(params, opt_state, state0, key)[4]["loss"]))
    results["sync_s"] = round(t, 4)
    results["sync_env_steps_per_s"] = round(batch * horizon / t)

    # --- pipelined, one device (overlap control) --------------------------
    def pipe_rounds(n, adev=None, ldev=None):
        pair = make_pipeline(lowered, cfg, tx)
        run_pipelined(lowered, cfg, tx, params, opt_state, state0, key,
                      2, actor_device=adev, learner_device=ldev,
                      pipeline=pair)  # warm/compile
        t0 = time.perf_counter()
        p, o, s, k, met = run_pipelined(
            lowered, cfg, tx, params, opt_state, state0, key, n,
            actor_device=adev, learner_device=ldev, pipeline=pair)
        sync_scalar(met["loss"])
        return (time.perf_counter() - t0) / n

    t = pipe_rounds(iters)
    results["pipe1_s"] = round(t, 4)
    results["pipe1_env_steps_per_s"] = round(batch * horizon / t)

    if jax.device_count() >= 2:
        d0, d1 = jax.devices()[0], jax.devices()[1]
        t = pipe_rounds(iters, adev=d0, ldev=d1)
        results["pipe2_s"] = round(t, 4)
        results["pipe2_env_steps_per_s"] = round(batch * horizon / t)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
