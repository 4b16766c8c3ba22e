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
import os
import sys
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np


def _require_backend(timeout_s: float = 150.0) -> None:
    """Fail fast (exit 2) when the accelerator backend cannot initialize.

    `jax.devices()` blocks indefinitely inside `make_c_api_client` when the
    axon relay is unhealthy — round 3 lost its driver bench artifact to
    exactly this (rc=124 after the driver timeout, zero diagnostics). Probe
    the backend on a daemon thread: normal init is seconds (compiles are
    the slow part and happen later), so a silent probe past `timeout_s`
    means the relay is down, and a loud fast exit beats an opaque hang."""
    out = {}

    def probe():
        try:
            out["devices"] = [str(d) for d in jax.devices()]
        except Exception as e:
            out["error"] = repr(e)

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if "devices" not in out:
        print(json.dumps({
            "error": "jax backend unavailable",
            "detail": out.get(
                "error",
                f"jax.devices() did not answer within {timeout_s:.0f}s "
                "(axon relay down?)"),
        }), file=sys.stderr, flush=True)
        # the stuck probe thread holds the backend lock; skip atexit
        os._exit(2)


def policy_rollout_bench(batch: int, inner_steps: int, iters: int):
    """Learned-policy self-play hot loop: masked observation -> net forward
    -> legal-masked sampling -> engine step -> auto-reset, fused in one
    scan. The realistic serving/self-play rate (VERDICT r1: bench the
    policy-in-the-loop path, not just scripted rollouts)."""
    from game_engine_tpu.core.engine import init_state_like
    from game_engine_tpu.core.state import init_state
    from game_engine_tpu.core.step import make_step
    from game_engine_tpu.gamespec.compile import compile_game
    from game_engine_tpu.gamespec.parser import load_builtin
    from game_engine_tpu.gamespec.tables import lower
    from game_engine_tpu.policies import net as N
    from game_engine_tpu.train.ppo import actor_mask

    lowered = lower(compile_game(load_builtin("werewolf")))
    cfg = N.NetConfig(hidden=256, layers=2)
    params = N.init_params(
        jax.random.PRNGKey(0), N.obs_dim(lowered), N.action_space(lowered), cfg
    )
    step = make_step(lowered)

    def rollout(state, key):
        def body(carry, _):
            st, k = carry
            k, sk = jax.random.split(k)
            a, _, _, _ = N.sample_actions(lowered, params, st, sk, cfg)
            actions = jnp.where(actor_mask(lowered, st), a, 0)
            nxt = step(st, actions)
            eps = jnp.sum((nxt.done & ~st.done).astype(jnp.int32))
            fresh = init_state_like(lowered, nxt)
            nxt = jax.tree_util.tree_map(
                lambda new, old: jnp.where(
                    nxt.done.reshape((-1,) + (1,) * (old.ndim - 1)), new, old
                ),
                fresh,
                nxt,
            )
            return (nxt, k), eps

        (state, key), eps = jax.lax.scan(body, (state, key), None, length=inner_steps)
        return state, key, jnp.sum(eps)

    roll = jax.jit(rollout, donate_argnums=(0,))
    state = init_state(lowered, batch, 8, np.arange(batch, dtype=np.uint32))
    key = jax.random.PRNGKey(7)
    state, key, eps = roll(state, key)
    _ = int(eps)
    t0 = time.perf_counter()
    total = 0
    for _ in range(iters):
        state, key, eps = roll(state, key)
        total += int(eps)
    dt = time.perf_counter() - t0
    steps = batch * inner_steps * iters
    print(json.dumps({
        "metric": "policy_env_steps_per_sec_per_chip_werewolf",
        "value": round(steps / dt, 1),
        "unit": "steps/s",
        "vs_baseline": round(steps / dt / 1_000_000, 3),
        "detail": {"batch_rooms": batch, "inner_steps": inner_steps,
                   "iters": iters, "wall_s": round(dt, 3),
                   "episodes_completed": total,
                   "hidden": cfg.hidden, "device": str(jax.devices()[0])},
    }))


def main():
    _require_backend()
    from game_engine_tpu.core.engine import compiled_rollout
    from game_engine_tpu.core.state import init_state
    from game_engine_tpu.gamespec.compile import compile_game
    from game_engine_tpu.gamespec.parser import load_builtin
    from game_engine_tpu.gamespec.tables import lower

    if len(sys.argv) > 1 and sys.argv[1] == "--policy":
        argv = sys.argv[2:]
        policy_rollout_bench(
            int(argv[0]) if len(argv) > 0 else 16384,
            int(argv[1]) if len(argv) > 1 else 128,
            int(argv[2]) if len(argv) > 2 else 4,
        )
        return

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    inner_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 16

    lowered = lower(compile_game(load_builtin("werewolf")))
    rollout = compiled_rollout(lowered, inner_steps, auto_reset=True)

    seeds = np.arange(batch, dtype=np.uint32)
    state = init_state(lowered, batch, 8, seeds)

    # warmup + compile (int() forces a real host sync on every path)
    state, eps = rollout(state)
    _ = int(eps)

    # Secondary: hard host sync each iteration. This pays the relay's
    # ~25 ms round trip on EVERY scan (utils/ab_tax.py calibration) —
    # kept for cross-round comparability with the r1-r4 numbers, but it
    # measures relay latency as much as the chip.
    total_eps = 0
    durations = []
    for _ in range(iters):
        t0 = time.perf_counter()
        state, eps = rollout(state)
        total_eps += int(eps)  # hard host sync each iteration
        durations.append(time.perf_counter() - t0)
    durations.sort()
    med = durations[len(durations) // 2]
    sync_dt = sum(durations)
    steps_per_iter = batch * inner_steps
    sps_sync = steps_per_iter / med

    # Headline: dispatch-pipelined sustained rate. A real rollout client
    # queues the next scan without waiting for the previous result (JAX
    # dispatch is async; donate_argnums chains the state on device), so
    # the relay round trip is paid once per GROUP, not once per scan.
    # Median over several groups keeps robustness to relay stalls.
    groups, iters_per_group = 4, max(4, iters // 2)
    group_rates = []
    for _ in range(groups):
        t0 = time.perf_counter()
        eps_out = []
        for _ in range(iters_per_group):
            state, eps = rollout(state)
            eps_out.append(eps)
        total_eps += sum(int(e) for e in eps_out)  # one sync per group
        gdt = time.perf_counter() - t0
        group_rates.append(steps_per_iter * iters_per_group / gdt)
    group_rates.sort()
    sps = group_rates[len(group_rates) // 2]
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
                    "pipelined_groups": groups,
                    "iters_per_group": iters_per_group,
                    "hard_sync_steps_per_s": round(sps_sync, 1),
                    "hard_sync_median_iter_s": round(med, 4),
                    "hard_sync_wall_s": round(sync_dt, 3),
                    "episodes_completed": total_eps,
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
