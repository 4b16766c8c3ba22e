"""Measure the search-bot tier (policies/search.py) against scripted play.

For a team game: minority-team win rate with (a) everyone scripted,
(b) the minority searching, (c) the majority searching. For score/survivor
games: seat 1 searching vs scripted. Also times one search decision (the
serving-latency cost of the tier). Deterministic: fixed seeds.

    python -m game_engine_tpu.utils.eval_search [game] [rooms] [rollouts] \
        [horizon] [determinize]

determinize=D>0 evaluates the INFORMATION-SET tier (SearchBots
determinize=D): bots score candidates over D hidden-state worlds sampled
under their own observation mask instead of reading the true state —
the honest comparison point for the full-information numbers.
"""

from __future__ import annotations

import json
import sys
import time


def eval_game(game: str, rooms: int, rollouts: int, horizon: int,
              determinize: int = 0) -> dict:
    from game_engine_tpu.gamespec.compile import compile_game
    from game_engine_tpu.gamespec.parser import load_builtin
    from game_engine_tpu.gamespec.tables import lower
    from game_engine_tpu.policies.search import SearchBots

    lw = lower(compile_game(load_builtin(game)))
    go = lw.game_overs[0] if lw.game_overs else None
    sb = SearchBots(lw, rollouts=rollouts, horizon=horizon,
                    determinize=determinize)
    n = min(6, lw.P)

    def play(search_pred):
        """search_pred(pid, read) -> bool: which seats search this room."""
        wins_minority = 0
        wins_seat1 = 0
        decisions = 0
        t_search = 0.0
        for i in range(rooms):
            room = sb._game.room(n, 9000 + i)
            for _ in range(600):
                r = room.read()
                if r["done"]:
                    break
                acts = room.policy_actions()
                if search_pred is not None:
                    t0 = time.perf_counter()
                    sa = sb.native_actions(r, n, seed=9000 + i)
                    t_search += time.perf_counter() - t0
                    decisions += len(sa)  # every searched seat, incl. unused
                    for pid, c in sa.items():
                        if search_pred(pid, r):
                            acts[pid] = c
                room.step(acts)
            w = room.read()["winner"]
            wins_minority += w == 1
            wins_seat1 += w == 1
        return (wins_minority / rooms, decisions,
                t_search / max(decisions, 1) if search_pred else 0.0)

    out = {"game": game, "rooms": rooms, "rollouts": rollouts,
           "horizon": horizon, "determinize": determinize,
           "n_players": n, "mode": go.mode if go else None}
    base, _, _ = play(None)
    out["scripted_minority_or_seat1_win"] = round(base, 4)
    if go and go.mode == "team":
        slot, min_code = go.team_str_slot, go.team_codes[0]

        def is_min(pid, r):
            return int(r["strs"][pid - 1, slot]) == min_code

        wmin, d1, lat1 = play(is_min)
        wmaj, d2, lat2 = play(lambda pid, r: not is_min(pid, r))
        out["minority_search_win"] = round(wmin, 4)
        out["majority_search_minority_win"] = round(wmaj, 4)
        out["decisions"] = d1 + d2
        out["s_per_decision"] = round((lat1 + lat2) / 2, 5)
    else:
        w1, d1, lat1 = play(lambda pid, r: pid == 1)
        out["seat1_search_win"] = round(w1, 4)
        out["decisions"] = d1
        out["s_per_decision"] = round(lat1, 5)
    return out


def main() -> None:
    game = sys.argv[1] if len(sys.argv) > 1 else "werewolf"
    rooms = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    rollouts = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    horizon = int(sys.argv[4]) if len(sys.argv) > 4 else 200
    determinize = int(sys.argv[5]) if len(sys.argv) > 5 else 0

    if game != "all":
        print(json.dumps(eval_game(game, rooms, rollouts, horizon,
                                   determinize)))
        return

    # catalog balance sweep: one line per game. The pair
    # (scripted baseline, search swing) is a game-design QA signal — a
    # baseline near 0/1 that search cannot move marks a structurally
    # degenerate game; a big swing marks a skill-dominated one.
    import os

    from game_engine_tpu.gamespec.parser import games_dir

    for fn in sorted(os.listdir(games_dir())):
        if not fn.endswith((".yaml", ".yml")):
            continue
        name = fn.rsplit(".", 1)[0]
        try:
            out = eval_game(name, rooms, rollouts, horizon)
        except Exception as e:  # noqa: BLE001 — no searchable terminal etc.
            out = {"game": name, "skipped": str(e)[:120]}
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
