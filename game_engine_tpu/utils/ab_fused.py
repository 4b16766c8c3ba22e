"""A/B: fused Pallas policy-net kernels (policies/fused.py) vs the XLA
apply_net path, in ONE process (axon drift discipline; hard host syncs;
medians). This is the round-4 "make the update itself cheaper" lever
(docs/PERF.md "Where the attn update's time actually goes"): the XLA
attn update is ~10-15x off roofline on HBM round-trips; the fused
kernels keep each row block's whole fwd/bwd in VMEM.

Rows measured (XLA vs fused):
  net_fwd     one per-step (B, P, F) forward (the rollout's dispatch shape)
  loss_grad   value_and_grad of the real ppo_loss on a fixed trajectory
  update      the pipeline's update program (epochs as configured)
  collect     the rollout program (sampling forward rides the kernel too)
  sync        collect + update serially -> env-steps/s (the headline)

    python -m game_engine_tpu.utils.ab_fused [batch] [horizon] [epochs] \
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
    from game_engine_tpu.train.pipeline import make_pipeline
    from game_engine_tpu.train.ppo import (PPOConfig, gae, init_training,
                                           make_apply_fn, ppo_loss)

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    horizon = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 16
    arch = sys.argv[5] if len(sys.argv) > 5 else "attn"

    lowered = lower(compile_game(load_builtin("werewolf")))
    cfgs = {
        "xla": PPOConfig(horizon=horizon, epochs=epochs,
                         net=N.NetConfig(hidden=256, arch=arch)),
        "fused": PPOConfig(horizon=horizon, epochs=epochs, fused_net=True,
                           net=N.NetConfig(hidden=256, arch=arch)),
    }
    key = jax.random.PRNGKey(0)
    params, opt_state, tx = init_training(lowered, cfgs["xla"], key)
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

    out = {"batch": batch, "horizon": horizon, "epochs": epochs,
           "arch": arch, "iters": iters}

    def note(msg):
        print(f"# {msg}", flush=True)  # progress: relay compiles are slow

    # one shared trajectory so loss_grad rows see identical data
    note("compiling shared collect")
    collect_x, update_x = make_pipeline(lowered, cfgs["xla"], tx)
    st, ky, traj, lobs = collect_x(params, state0, key)
    sync(traj.reward)

    for name, cfg in cfgs.items():
        apply_fn = make_apply_fn(lowered, cfg)
        # one-timestep (B, P, F) forward — the shape every rollout step
        # dispatches. (A whole-(T,B) forward OOMs the attn arch on chip,
        # and is not a shape any real path runs.)
        fwd = jax.jit(lambda p, o, a=apply_fn: a(p, o))
        step_obs = traj.obs[0]
        note(f"{name}: net_fwd compile")
        sync(fwd(params, step_obs)[0])
        out[f"net_fwd_{name}_s"] = timed(lambda: sync(fwd(params, step_obs)[0]))
        note(f"{name}: net_fwd {out[f'net_fwd_{name}_s']:.4f}s")

        _, last_v = N.apply_net(params, lobs, cfg.net, lowered)
        adv, ret = gae(traj, last_v, cfg)
        # trajectory/advantages ride as ARGUMENTS: closed-over arrays embed
        # as HLO constants, and a (T,B,P,F) constant blows the relay's
        # compile-request body limit (HTTP 413, ab_fused round-4 capture)
        lg = jax.jit(jax.value_and_grad(
            lambda p, tr, ad, rt, c=cfg: ppo_loss(p, tr, ad, rt, c,
                                                  lowered)[0]))
        note(f"{name}: loss_grad compile")
        sync(lg(params, traj, adv, ret)[0])
        out[f"loss_grad_{name}_s"] = timed(
            lambda: sync(lg(params, traj, adv, ret)[0]))
        note(f"{name}: loss_grad {out[f'loss_grad_{name}_s']:.4f}s")

        note(f"{name}: pipeline compile")
        collect, update = make_pipeline(lowered, cfg, tx)
        sync(collect(params, state0, key)[2].reward)
        out[f"collect_{name}_s"] = timed(
            lambda: sync(collect(params, state0, key)[2].reward))
        sync(update(params, opt_state, traj, lobs)[2]["loss"])
        out[f"update_{name}_s"] = timed(
            lambda: sync(update(params, opt_state, traj, lobs)[2]["loss"]))

        def one_sync_round(c=collect, u=update):
            _, _, tr, lo = c(params, state0, key)
            return sync(u(params, opt_state, tr, lo)[2]["loss"])

        note(f"{name}: update {out[f'update_{name}_s']:.4f}s; sync rounds")
        one_sync_round()
        t = timed(one_sync_round)
        out[f"sync_{name}_s"] = t
        out[f"sync_{name}_env_steps_per_s"] = batch * horizon / t

    for row in ("net_fwd", "loss_grad", "collect", "update", "sync"):
        a, b = out[f"{row}_xla_s"], out[f"{row}_fused_s"]
        out[f"{row}_speedup"] = a / b
    print(json.dumps({k: (round(v, 6) if isinstance(v, float) else v)
                      for k, v in out.items()}))


if __name__ == "__main__":
    main()
