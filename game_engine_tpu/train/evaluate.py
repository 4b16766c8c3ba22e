"""Standalone policy evaluation CLI.

    python -m game_engine_tpu.train.evaluate --game werewolf \
        --checkpoint /path/params --batch 2048 --steps 512

Loads a policy checkpoint (utils.checkpoint.save_tree format) and reports
cross-play win rates against the scripted baseline in both directions, plus
episode statistics. Without --checkpoint it evaluates a fresh (random-init)
policy — the scripted-vs-scripted baseline for calibration.

League matchup mode:

    python -m game_engine_tpu.train.evaluate --game werewolf \
        --matchup snapshots/*.npz --batch 2048 --steps 512

plays every ordered pair of checkpoints head-to-head (row policy as the
minority side, column policy as the majority) and prints the win-rate
matrix — the frozen-snapshot evaluation the league trains against.
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from game_engine_tpu.core.engine import init_state_like
from game_engine_tpu.core.state import init_state
from game_engine_tpu.core.step import make_step
from game_engine_tpu.gamespec.compile import compile_game
from game_engine_tpu.gamespec.parser import load_builtin
from game_engine_tpu.gamespec.tables import lower
from game_engine_tpu.policies import net as N
from game_engine_tpu.train.ppo import PPOConfig, actor_mask, init_training
from game_engine_tpu.train.run import make_eval, team_masks
from game_engine_tpu.utils.checkpoint import load_tree


def make_vs(lowered, cfg: PPOConfig, n_steps: int):
    """Head-to-head: params_min plays the minority side, params_maj the
    rest. Returns jitted (params_min, params_maj, state, key) ->
    (minority_wins, episodes)."""
    step = make_step(lowered)

    def run(params_min, params_maj, state, key):
        def body(carry, _):
            st, k = carry
            k, s1, s2 = jax.random.split(k, 3)
            obs = N.observe(lowered, st)
            a_min, _, _, _ = N.sample_actions(lowered, params_min, st, s1, cfg.net, obs=obs)
            a_maj, _, _, _ = N.sample_actions(lowered, params_maj, st, s2, cfg.net, obs=obs)
            side = team_masks(lowered, st)
            am = actor_mask(lowered, st)
            actions = jnp.where(am & side, a_min, jnp.where(am, a_maj, 0))
            nxt = step(st, actions)
            ended = nxt.done & ~st.done
            min_won = ended & (nxt.winner == 1)
            fresh = init_state_like(lowered, nxt)
            nxt = jax.tree_util.tree_map(
                lambda new, old: jnp.where(
                    nxt.done.reshape((-1,) + (1,) * (old.ndim - 1)), new, old
                ),
                fresh,
                nxt,
            )
            return (nxt, k), (jnp.sum(min_won), jnp.sum(ended))

        (state, _), (wins, dones) = jax.lax.scan(body, (state, key), None, length=n_steps)
        return jnp.sum(wins), jnp.sum(dones)

    return jax.jit(run)


def matchup_table(lowered, cfg: PPOConfig, checkpoints: list[str],
                  batch: int, steps: int, players: int, seed: int) -> dict:
    """Win-rate matrix over frozen snapshots: entry [i][j] = minority-side
    win rate of policy i against policy j holding the majority."""
    params0, _, _ = init_training(lowered, cfg, jax.random.PRNGKey(0))
    pols = [(os.path.basename(p).replace(".npz", ""), load_tree(p, params0))
            for p in checkpoints]
    vs = make_vs(lowered, cfg, steps)
    table: dict[str, dict[str, float]] = {}
    for i, (ni, pi) in enumerate(pols):
        table[ni] = {}
        for j, (nj, pj) in enumerate(pols):
            state = init_state(lowered, batch, players,
                               np.arange(batch, dtype=np.uint32) + seed)
            wins, dones = vs(pi, pj, state, jax.random.PRNGKey(seed + i * 31 + j))
            table[ni][nj] = round(float(wins) / max(float(dones), 1.0), 4)
    return table


def elo_fit(table: dict, iters: int = 4000, lr: float = 0.5) -> dict:
    """Fit Elo ratings + a minority-side advantage to the matchup matrix.

    Model: P(row i beats column j when i plays the minority side) =
    sigmoid(s_i - s_j + b), where b absorbs the game's structural side
    asymmetry (werewolf's minority wins ~25% under uniform play, so b<0
    there). The diagonal (self-play) pins b directly since s_i - s_i = 0.
    Plain logistic regression by full-batch gradient descent; ratings are
    reported in Elo points (400/ln 10 per nat) centered at 0.
    """
    names = list(table)
    n = len(names)
    w = np.asarray([[table[r][c] for c in names] for r in names], np.float64)
    s = np.zeros(n)
    b = 0.0
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(s[:, None] - s[None, :] + b)))
        g = p - w  # dLoss/dlogit for the mean cross-entropy
        s -= lr * (g.sum(axis=1) - g.sum(axis=0)) / (2 * n)
        b -= lr * g.mean()
    scale = 400.0 / np.log(10.0)
    s = (s - s.mean()) * scale
    return {
        "ratings": {names[i]: round(float(s[i]), 1) for i in np.argsort(-s)},
        "minority_side_elo": round(float(b * scale), 1),
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--game", default="werewolf")
    ap.add_argument("--checkpoint", default="")
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--players", type=int, default=6)
    ap.add_argument("--steps", type=int, default=256)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--arch", default="mlp", choices=["mlp", "deepsets", "attn"])
    ap.add_argument("--seed", type=int, default=777)
    ap.add_argument("--matchup", nargs="*", default=None,
                    help="checkpoint paths: head-to-head win-rate matrix")
    args = ap.parse_args(argv)

    lowered = lower(compile_game(load_builtin(args.game)))
    cfg = PPOConfig(net=N.NetConfig(hidden=args.hidden, arch=args.arch))
    if args.matchup:
        table = matchup_table(lowered, cfg, args.matchup, args.batch,
                              args.steps, args.players, args.seed)
        elo = elo_fit(table)
        out = {"game": args.game, "mode": "matchup",
               "rows_play": "minority side", "table": table, "elo": elo}
        print(json.dumps(out))
        names = list(table)
        width = max(len(n) for n in names) + 2
        print("\nminority-side win rate (row vs column):")
        print(" " * width + "  ".join(f"{n[:10]:>10}" for n in names))
        for r in names:
            print(f"{r:<{width}}" + "  ".join(f"{table[r][c]:>10.3f}" for c in names))
        print(f"\nElo (minority-side advantage {elo['minority_side_elo']:+.0f}):")
        for name, r in elo["ratings"].items():
            print(f"  {name:<{width}} {r:+8.1f}")
        return out
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
