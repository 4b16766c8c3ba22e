"""Relay dispatch-tax calibration for the ENV STEP headline.

The matmul-chain calibration (docs/PERF.md round-4 continuation) showed the
axon relay charges ~30 ms per hard-synced dispatch regardless of payload.
This harness asks what that means for the headline bench specifically:
compile the SAME auto-reset werewolf rollout at several scan lengths,
interleave their timed iterations round-robin in ONE process (the only
trustworthy comparison under relay drift — docs/PERF.md measurement
hygiene), and fit

    median_iter_wall_s(L) = tax + per_step_s * (batch * L)

by least squares. `per_step_s` is the device-only per-step cost (the
speed-of-light rate the chip would sustain without the relay round trip);
`tax` is the fixed per-dispatch cost the driver-style bench pays once per
hard-synced iteration.

    python -m game_engine_tpu.utils.ab_tax [batch] [iters] [L1,L2,...]

Defaults: batch 4096, 12 iters per grain, L = 256,1024,4096,8192.
Prints one JSON line per grain plus a final fit line.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> None:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    grains = ([int(x) for x in sys.argv[3].split(",")]
              if len(sys.argv) > 3 else [256, 1024, 4096, 8192])

    from game_engine_tpu.core.engine import compiled_rollout
    from game_engine_tpu.core.state import init_state
    from game_engine_tpu.gamespec.compile import compile_game
    from game_engine_tpu.gamespec.parser import load_builtin
    from game_engine_tpu.gamespec.tables import lower

    lowered = lower(compile_game(load_builtin("werewolf")))
    rolls = {}
    states = {}
    for L in grains:
        rolls[L] = compiled_rollout(lowered, L, auto_reset=True)
        states[L] = init_state(lowered, batch, 8,
                               np.arange(batch, dtype=np.uint32) + L)
        states[L], eps = rolls[L](states[L])  # compile + warm
        _ = int(eps)
        print(json.dumps({"event": "warm", "inner_steps": L}), flush=True)

    samples: dict[int, list[float]] = {L: [] for L in grains}
    for it in range(iters):
        for L in grains:  # round-robin: every grain sees the same drift
            t0 = time.perf_counter()
            states[L], eps = rolls[L](states[L])
            _ = int(eps)  # hard host sync
            samples[L].append(time.perf_counter() - t0)

    med = {}
    for L in grains:
        s = sorted(samples[L])
        med[L] = s[len(s) // 2]
        print(json.dumps({
            "inner_steps": L,
            "median_iter_s": round(med[L], 5),
            "steps_per_sec": round(batch * L / med[L], 1),
            "spread": [round(s[0], 5), round(s[-1], 5)],
        }), flush=True)

    # least-squares fit: wall = tax + per_step * steps
    xs = np.asarray([batch * L for L in grains], np.float64)
    ys = np.asarray([med[L] for L in grains], np.float64)
    A = np.stack([np.ones_like(xs), xs], axis=1)
    (tax, per_step), *_ = np.linalg.lstsq(A, ys, rcond=None)
    resid = ys - (tax + per_step * xs)
    print(json.dumps({
        "event": "fit",
        "batch_rooms": batch,
        "tax_ms": round(tax * 1e3, 2),
        "ns_per_room_step": round(per_step * 1e9, 3),
        "device_only_steps_per_sec": round(1.0 / per_step, 1),
        "headline_grain_1024_share_tax": round(
            float(tax / (tax + per_step * batch * 1024)), 3),
        "max_resid_ms": round(float(np.abs(resid).max() * 1e3), 2),
    }), flush=True)


if __name__ == "__main__":
    main()
