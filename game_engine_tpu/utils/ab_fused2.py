"""Decompose the fused attn update's residual (round 5, VERDICT item 6).

ab_fused shows the fused loss_grad at ~194 ms where the FLOP roofline is
~20 ms — this harness splits KERNEL time from PPO GLUE time and sweeps
the grid block size, in one process with hard syncs:

  fwd[br]     fused forward kernel alone over the full (T, B, P) rows
  vgrad[br]   value_and_grad of sum(logits)+sum(value) — fwd+bwd kernels
              only, no PPO math
  loss_vg     value_and_grad of the real ppo_loss (kernels + glue)

    python -m game_engine_tpu.utils.ab_fused2 [batch] [horizon] [iters] \
        [br1,br2,...]
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    from game_engine_tpu.core.state import init_state
    from game_engine_tpu.gamespec.compile import compile_game
    from game_engine_tpu.gamespec.parser import load_builtin
    from game_engine_tpu.gamespec.tables import lower
    from game_engine_tpu.policies import fused as FZ
    from game_engine_tpu.policies import net as N
    from game_engine_tpu.train.pipeline import make_pipeline
    from game_engine_tpu.train.ppo import (PPOConfig, gae, init_training,
                                           ppo_loss)

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    horizon = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    brs = ([int(x) for x in sys.argv[4].split(",")]
           if len(sys.argv) > 4 else [128, 256, 512])

    lowered = lower(compile_game(load_builtin("werewolf")))
    cfg = PPOConfig(horizon=horizon, epochs=1, fused_net=True,
                    net=N.NetConfig(hidden=256, arch="attn"))
    key = jax.random.PRNGKey(0)
    params, opt_state, tx = init_training(lowered, cfg, key)
    state0 = init_state(lowered, batch, 8, np.arange(batch, dtype=np.uint32))

    def sync(x):
        return float(jax.numpy.asarray(x).ravel()[0])

    def timed(fn, n=iters):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    def note(msg):
        print(f"# {msg}", flush=True)

    note("collect trajectory")
    collect, _ = make_pipeline(lowered, cfg, tx)
    st, ky, traj, lobs = collect(params, state0, key)
    sync(traj.reward)
    _, last_v = FZ.make_apply(lowered, cfg.net)(params, N.observe(lowered, st))
    adv, ret = gae(traj, last_v, cfg)
    sync(adv)
    obs = traj.obs
    rows = int(np.prod(obs.shape[:-1]))
    note(f"rows={rows} F={obs.shape[-1]}")

    out = {"batch": batch, "horizon": horizon, "rows": rows,
           "iters": iters}

    for br in brs:
        apply_br = FZ.make_apply(lowered, cfg.net, block_rows=br)

        fwd = jax.jit(lambda p, o: apply_br(p, o)[0].sum())  # obs is an arg
        try:
            note(f"br={br}: fwd compile")
            sync(fwd(params, obs))
            out[f"fwd_br{br}_s"] = round(
                timed(lambda: sync(fwd(params, obs))), 5)

            def raw_loss(p, o):
                lg, v = apply_br(p, o)
                return lg.sum() + v.sum()

            vg = jax.jit(jax.value_and_grad(raw_loss))
            note(f"br={br}: vgrad compile")
            val, gr = vg(params, obs)
            sync(val)

            def run_vg():
                val, gr = vg(params, obs)
                sync(val)

            out[f"vgrad_br{br}_s"] = round(timed(run_vg), 5)
        except Exception as e:  # noqa: BLE001 — VMEM overflow at big br
            out[f"br{br}_error"] = repr(e)[:160]
            note(f"br={br}: FAILED {e!r}"[:200])
            continue
        note(f"br={br}: fwd={out.get(f'fwd_br{br}_s')} "
             f"vgrad={out.get(f'vgrad_br{br}_s')}")

    def full_loss(p, traj, adv, ret):
        return ppo_loss(p, traj, adv, ret, cfg, lowered)[0]

    # trajectory as jit ARGUMENTS — closing over it embeds it as HLO
    # constants and blows the relay's compile-body limit (HTTP 413, the
    # round-4c lesson)
    lvg = jax.jit(jax.value_and_grad(full_loss))
    note("loss_vg compile")
    val, gr = lvg(params, traj, adv, ret)
    sync(val)

    def run_lvg():
        val, gr = lvg(params, traj, adv, ret)
        sync(val)

    out["loss_vg_s"] = round(timed(run_lvg), 5)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
