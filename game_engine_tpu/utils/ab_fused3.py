"""Micro-decompose the fused attn kernel's per-grid-step cost (round 5).

ab_fused2 localized the residual INSIDE the kernels (vgrad of the raw
kernels == the full ppo_loss grad; block size 128/256/512 flat). This
harness attributes the kernel's own time by timing VARIANT kernels —
numerics are irrelevant here, only the op mix changes:

  attn_fwd        the real attn forward kernel
  attn_nogelu     gelu -> identity (isolates the tanh transcendentals)
  deepsets_fwd    no attention block (isolates LN+qkv+softmax+ao)
  deepsets_nogelu both off (matmul + pool/head glue only)

    python -m game_engine_tpu.utils.ab_fused3 [batch] [horizon] [iters]
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
    from game_engine_tpu.policies import fused as FZ
    from game_engine_tpu.policies import net as N
    from game_engine_tpu.train.pipeline import make_pipeline
    from game_engine_tpu.train.ppo import PPOConfig, init_training

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    horizon = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    lowered = lower(compile_game(load_builtin("werewolf")))
    key = jax.random.PRNGKey(0)

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

    cfg = PPOConfig(horizon=horizon, epochs=1, fused_net=True,
                    net=N.NetConfig(hidden=256, arch="attn"))
    params, opt_state, tx = init_training(lowered, cfg, key)
    state0 = init_state(lowered, batch, 8, np.arange(batch, dtype=np.uint32))
    collect, _ = make_pipeline(lowered, cfg, tx)
    st, ky, traj, lobs = collect(params, state0, key)
    sync(traj.reward)
    obs = traj.obs
    note(f"rows={int(np.prod(obs.shape[:-1]))}")

    cfg_ds = PPOConfig(horizon=horizon, epochs=1, fused_net=True,
                       net=N.NetConfig(hidden=256, arch="deepsets"))
    params_ds, _, _ = init_training(lowered, cfg_ds, key)

    out = {"batch": batch, "horizon": horizon, "iters": iters}
    real_gelu, real_dgelu = FZ._gelu, FZ._dgelu

    for gelu_on in (True, False):
        FZ._gelu = real_gelu if gelu_on else (lambda x: x)
        FZ._dgelu = real_dgelu if gelu_on else (lambda x: x * 0 + 1.0)
        for arch, p in (("attn", params), ("deepsets", params_ds)):
            tag = f"{arch}{'' if gelu_on else '_nogelu'}"
            netcfg = (cfg if arch == "attn" else cfg_ds).net
            ap = FZ.make_apply(lowered, netcfg)
            fwd = jax.jit(lambda pp, o, ap=ap: ap(pp, o)[0].sum())
            def raw(pp, o, ap=ap):
                lg, v = ap(pp, o)
                return lg.sum() + v.sum()

            vg = jax.jit(jax.value_and_grad(raw))
            note(f"{tag}: compile")
            sync(fwd(p, obs))
            out[f"fwd_{tag}_s"] = round(timed(lambda: sync(fwd(p, obs))), 5)
            v, gr = vg(p, obs)
            sync(v)

            def run_vg(vg=vg, p=p):
                v, gr = vg(p, obs)
                sync(v)

            out[f"vgrad_{tag}_s"] = round(timed(run_vg), 5)
            note(f"{tag}: fwd={out[f'fwd_{tag}_s']} "
                 f"vgrad={out[f'vgrad_{tag}_s']}")
    FZ._gelu, FZ._dgelu = real_gelu, real_dgelu
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
