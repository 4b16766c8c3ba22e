"""Same-session interleaved A/B: HEAD rollout vs a pinned historical build.

VERDICT r4 weak-item 2: the driver-captured hard-sync rate regressed from
85.6M (r2) to 71.0M (r4) and the only explanation on file was "relay-day
variance" — a testable, untested hypothesis, because every prior comparison
was cross-session (different relay day, different host load), exactly what
docs/PERF.md says not to trust.

This harness closes it: build the werewolf rollout from a pinned commit's
worktree AND from HEAD in ONE process, warm both, then alternate
hard-synced iterations A,B,A,B,... so both builds see the identical relay,
host, and thermal conditions.  If HEAD's per-iteration time matches the
pin's within noise, the regression was environmental; if not, it is a real
code regression localized between the two commits.

Build isolation: both trees name the package `game_engine_tpu`, so each
build is imported with the other's modules purged from sys.modules and its
own root first on sys.path.  Only the AOT-compiled executable (+ its state
pytree) is kept across the swap — compiled executables depend on jax alone,
not on the defining modules.

Usage (TPU; ~2-6 min incl. two compiles):
    python -m game_engine_tpu.utils.ab_r2pin --pin /tmp/r2pin \
        [--batch 4096] [--steps 1024] [--iters 16]

Prep:  git worktree add /tmp/r2pin <commit>
"""

from __future__ import annotations

import argparse
import importlib
import json
import statistics
import sys
import time


def _purge(prefix: str = "game_engine_tpu") -> None:
    for name in [m for m in sys.modules if m == prefix
                 or m.startswith(prefix + ".")]:
        del sys.modules[name]


def build_rollout(root: str, batch: int, steps: int):
    """Import the package at *root*, build + AOT-compile the werewolf
    rollout, return (callable, initial_state).  Leaves sys.modules purged
    of the package so the next build starts clean."""
    import numpy as np

    _purge()
    sys.path.insert(0, root)
    try:
        eng = importlib.import_module("game_engine_tpu.core.engine")
        state_mod = importlib.import_module("game_engine_tpu.core.state")
        comp = importlib.import_module("game_engine_tpu.gamespec.compile")
        parser = importlib.import_module("game_engine_tpu.gamespec.parser")
        tables = importlib.import_module("game_engine_tpu.gamespec.tables")
        assert eng.__file__.startswith(root), (
            f"resolved {eng.__file__}, wanted build under {root}")
        lowered = tables.lower(comp.compile_game(parser.load_builtin("werewolf")))
        import jax
        roll = eng.compiled_rollout(lowered, steps, auto_reset=True)
        state = state_mod.init_state(
            lowered, batch, 8, np.arange(batch, dtype=np.uint32))
        compiled = jax.jit(roll).lower(state).compile() if not hasattr(
            roll, "lower") else roll.lower(state).compile()
        return compiled, state
    finally:
        sys.path.remove(root)
        _purge()


def hlo_histogram(compiled) -> dict:
    """Op histogram + fusion stats of an optimized executable."""
    import collections
    import re

    txt = compiled.as_text()
    ops = collections.Counter(
        m.group(1) for m in re.finditer(r"=\s*[\w\[\],<>x]*\s*(\w+)\(", txt))
    return {"total_ops": sum(ops.values()),
            "while": ops.get("while", 0),
            "fusion": ops.get("fusion", 0),
            "top": ops.most_common(20)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pin", required=True,
                    help="worktree root of the pinned historical commit")
    ap.add_argument("--pin-label", default="pin")
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--hlo", action="store_true",
                    help="print optimized-HLO op histograms instead of timing")
    args = ap.parse_args()

    if args.hlo:
        head_root = __file__.rsplit("/game_engine_tpu/", 1)[0]
        for label, root in ((args.pin_label, args.pin), ("HEAD", head_root)):
            fn, _st = build_rollout(root, args.batch, args.steps)
            print(json.dumps({"build": label, **hlo_histogram(fn)}),
                  flush=True)
        return

    head_root = __file__.rsplit("/game_engine_tpu/", 1)[0]

    builds = {}
    for label, root in ((args.pin_label, args.pin), ("HEAD", head_root)):
        t0 = time.perf_counter()
        fn, st = build_rollout(root, args.batch, args.steps)
        # warm: one full hard-synced call (first call after AOT compile
        # still pays transfer/layout work)
        st, eps = fn(st)
        _ = int(eps)
        builds[label] = {"fn": fn, "state": st, "times": [], "eps": 0}
        print(f"# built {label} from {root} "
              f"(compile+warm {time.perf_counter()-t0:.1f}s)", flush=True)

    order = list(builds)
    for i in range(args.iters):
        for label in (order if i % 2 == 0 else order[::-1]):
            b = builds[label]
            t0 = time.perf_counter()
            b["state"], eps = b["fn"](b["state"])
            b["eps"] += int(eps)  # hard host sync
            b["times"].append(time.perf_counter() - t0)

    spi = args.batch * args.steps
    out = {"batch": args.batch, "steps": args.steps, "iters": args.iters,
           "interleaved": True, "builds": {}}
    for label, b in builds.items():
        ts = sorted(b["times"])
        med = ts[len(ts) // 2]
        out["builds"][label] = {
            "median_iter_s": round(med, 4),
            "min_iter_s": round(ts[0], 4),
            "p90_iter_s": round(ts[int(len(ts) * 0.9)], 4),
            "stdev_s": round(statistics.pstdev(ts), 4),
            "hard_sync_steps_per_s": round(spi / med, 1),
            "episodes": b["eps"],
        }
    pin_med = out["builds"][args.pin_label]["median_iter_s"]
    head_med = out["builds"]["HEAD"]["median_iter_s"]
    # >1.0 = HEAD is slower per iteration than the pin
    out["head_over_pin_iter_ratio"] = (
        round(head_med / pin_med, 4) if pin_med else None)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
