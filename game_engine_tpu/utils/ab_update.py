"""Component breakdown of the attn PPO *update* cost (ROADMAP round-4
gap: "making the update itself cheaper" is the named lever left after
rollout/update overlap measured dead, docs/PERF.md).

Times, in ONE process (axon drift discipline; hard host syncs; medians):

  update_ep2 / update_ep1   the pipeline's update program at epochs=2/1
                            (fixed trajectory, so deltas are pure update)
  loss_fwd                  one forward-only loss pass (jit of ppo_loss)
  loss_grad                 one value_and_grad pass (fwd + remat-fwd + bwd)
  adam                      tx.update + apply_updates alone
  gae_lastv                 bootstrap value + GAE alone
  net_fwd                   raw apply_net over the whole (T,B,P,F) obs
                            (no lax.map/checkpoint; the fusion headroom
                            the chunked remat structure leaves behind)

The identities worth reading off: update_ep1 ~= gae_lastv + loss_grad +
adam; (update_ep2 - update_ep1) ~= loss_grad + adam; loss_grad /
loss_fwd is the backward multiplier; loss_fwd / net_fwd is what the
per-timestep remat map costs over one fused forward.

    python -m game_engine_tpu.utils.ab_update [batch] [horizon] [epochs] \
        [iters] [arch]
"""

from __future__ import annotations

import json
import sys
import time

import jax
import numpy as np
import optax


def main() -> None:
    from game_engine_tpu.core.state import init_state
    from game_engine_tpu.gamespec.compile import compile_game
    from game_engine_tpu.gamespec.parser import load_builtin
    from game_engine_tpu.gamespec.tables import lower
    from game_engine_tpu.policies import net as N
    from game_engine_tpu.train.pipeline import make_pipeline
    from game_engine_tpu.train.ppo import (PPOConfig, gae, init_training,
                                           ppo_loss)

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

    def timed(fn, n=iters):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    results = {"batch": batch, "horizon": horizon, "epochs": epochs,
               "arch": arch, "iters": iters}

    collect, update = make_pipeline(lowered, cfg, tx)
    st, ky, traj, lobs = collect(params, state0, key)
    sync_scalar(traj.reward)

    # --- full update at the configured epochs and at 1 --------------------
    sync_scalar(update(params, opt_state, traj, lobs)[2]["loss"])
    results["update_ep%d_s" % epochs] = round(timed(
        lambda: sync_scalar(update(params, opt_state, traj, lobs)[2]["loss"])), 4)
    cfg1 = PPOConfig(horizon=horizon, epochs=1, net=cfg.net)
    _, update1 = make_pipeline(lowered, cfg1, tx)
    sync_scalar(update1(params, opt_state, traj, lobs)[2]["loss"])
    results["update_ep1_s"] = round(timed(
        lambda: sync_scalar(update1(params, opt_state, traj, lobs)[2]["loss"])), 4)

    # --- pieces ------------------------------------------------------------
    @jax.jit
    def lastv_gae(params, traj, lobs):
        _, last_v = N.apply_net(params, lobs, cfg.net, lowered)
        adv, ret = gae(traj, last_v, cfg)
        return adv, ret

    adv, ret = lastv_gae(params, traj, lobs)
    sync_scalar(adv)
    results["gae_lastv_s"] = round(timed(
        lambda: sync_scalar(lastv_gae(params, traj, lobs)[0])), 4)

    @jax.jit
    def loss_fwd(params, traj, adv, ret):
        return ppo_loss(params, traj, adv, ret, cfg, lowered)[0]

    sync_scalar(loss_fwd(params, traj, adv, ret))
    results["loss_fwd_s"] = round(timed(
        lambda: sync_scalar(loss_fwd(params, traj, adv, ret))), 4)

    grad_fn = jax.jit(jax.value_and_grad(
        lambda p, t, a, r: ppo_loss(p, t, a, r, cfg, lowered)[0],
        argnums=0))
    g = grad_fn(params, traj, adv, ret)
    sync_scalar(g[0])
    results["loss_grad_s"] = round(timed(
        lambda: sync_scalar(grad_fn(params, traj, adv, ret)[0])), 4)

    @jax.jit
    def adam(params, opt_state, grads):
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    p2, o2 = adam(params, opt_state, g[1])
    sync_scalar(p2["w_pi"])
    results["adam_s"] = round(timed(
        lambda: sync_scalar(adam(params, opt_state, g[1])[0]["w_pi"])), 4)

    # --- fused forward over a 4-timestep slice (no lax.map / checkpoint;
    # the full T would hold ~6 GB of qkv intermediates at 8k rooms) -------
    @jax.jit
    def net_fwd(params, obs):
        return N.apply_net(params, obs, cfg.net, lowered)[0]

    tslice = min(4, horizon)
    obs4 = traj.obs[:tslice]
    sync_scalar(net_fwd(params, obs4))
    results["net_fwd%d_s" % tslice] = round(timed(
        lambda: sync_scalar(net_fwd(params, obs4))), 4)

    # derived ratios the writeup wants
    ep = "update_ep%d_s" % epochs
    results["bwd_over_fwd"] = round(results["loss_grad_s"] / results["loss_fwd_s"], 2)
    results["map_overhead"] = round(
        results["loss_fwd_s"]
        / (results["net_fwd%d_s" % tslice] * horizon / tslice), 2)
    results["epoch_marginal_s"] = round(
        results[ep] - results["update_ep1_s"], 4) if epochs > 1 else None
    print(json.dumps(results))


if __name__ == "__main__":
    main()
