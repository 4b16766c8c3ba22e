"""Standalone policy evaluation CLI.

    python -m game_engine_tpu.train.evaluate --game werewolf \
        --checkpoint /path/params --batch 2048 --steps 512

Loads a policy checkpoint (utils.checkpoint.save_tree format) and reports
cross-play win rates against the scripted baseline in both directions, plus
episode statistics. Without --checkpoint it evaluates a fresh (random-init)
policy — the scripted-vs-scripted baseline for calibration.
"""

from __future__ import annotations

import argparse
import json

import jax
import numpy as np

from game_engine_tpu.core.state import init_state
from game_engine_tpu.gamespec.compile import compile_game
from game_engine_tpu.gamespec.parser import load_builtin
from game_engine_tpu.gamespec.tables import lower
from game_engine_tpu.policies import net as N
from game_engine_tpu.train.ppo import PPOConfig, init_training
from game_engine_tpu.train.run import make_eval
from game_engine_tpu.utils.checkpoint import load_tree


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--game", default="werewolf")
    ap.add_argument("--checkpoint", default="")
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--players", type=int, default=6)
    ap.add_argument("--steps", type=int, default=256)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--seed", type=int, default=777)
    args = ap.parse_args(argv)

    lowered = lower(compile_game(load_builtin(args.game)))
    cfg = PPOConfig(net=N.NetConfig(hidden=args.hidden))
    params, _, _ = init_training(lowered, cfg, jax.random.PRNGKey(0))
    if args.checkpoint:
        params = load_tree(args.checkpoint, params)

    out = {"game": args.game, "checkpoint": args.checkpoint or "(random init)"}
    for name, side in (("learned_as_minority", True), ("learned_as_majority", False)):
        ev = make_eval(lowered, cfg, learned_side=side, n_steps=args.steps)
        state = init_state(lowered, args.batch, args.players,
                           np.arange(args.batch, dtype=np.uint32) + args.seed)
        wins, dones = ev(params, state, jax.random.PRNGKey(args.seed))
        out[name] = {
            "minority_win_rate": round(float(wins) / max(float(dones), 1.0), 4),
            "episodes": int(dones),
        }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
