"""Search bots: flat Monte-Carlo lookahead powered by the native C++ sim.

The reference's in-room bots decide contextually with an LLM call per turn
(reference: agent/game_agent_v2.py:468-617 BotBehaviorNode). The learned
tier (--bot-ckpt, policies/serve.py) answers that with a trained policy;
this tier answers it with SEARCH: the native simulator is fast enough
(~2.5M steps/s/core) that a bot can evaluate every legal choice by rolling
whole scripted continuations of the room to termination and picking the
choice with the best terminal outcome for itself — no checkpoint, no
model, works on any game with a team/survivor/score terminal rule.

Scoring mirrors train/ppo.py terminal_rewards exactly: team games compare
the bot's FINAL team (conversion games flip teams mid-episode) against the
winning team code; survivor/score games pay the winning seat. Rollouts use
common random numbers — rollout k replays the same opponent stream for
every candidate — so candidates are compared pairwise under identical
futures (variance reduction, and the whole decision is a pure function of
(room state, seed, config): journal replay reproduces search-bot rooms
bit-identically, same contract as the learned tier).

Served via ``server.api --bot-search`` (see server/manager.py); the C++
side is gs_room_search in native/gamesim.cpp.
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np

from game_engine_tpu.native.lib import CppGame, CppRoom


def _mix(a: int, b: int) -> int:
    """Cheap 32-bit mix for the per-call salt (not a semantics surface —
    any deterministic function works; the C++ side mixes further)."""
    x = ((a & 0xFFFFFFFF) * 0x9E3779B9 + (b & 0xFFFFFFFF) * 0x85EBCA6B)
    return x & 0xFFFFFFFF


class SearchBots:
    """Per-game lookahead actor with the same serving interface as
    policies/serve.py PolicyBots (native_actions / actions), so the host's
    per-seat scripted/learned/search mixing works unchanged."""

    def __init__(self, lowered, rollouts: int = 32, horizon: int = 200,
                 salt: int = 0):
        self.lowered = lowered
        self.rollouts = int(rollouts)
        self.horizon = int(horizon)
        self.salt = int(salt)
        go = lowered.game_overs[0] if lowered.game_overs else None
        if go is None:
            raise ValueError(
                f"game {lowered.game.spec.name!r} declares no terminal "
                "winner rule (LGameOver) — search has nothing to optimize; "
                "serve scripted or learned bots instead")
        if go.mode == "team" and go.team_str_slot >= 0 and go.team_codes:
            self._mode = 1
            self._team_slot = int(go.team_str_slot)
            self._team_codes = tuple(int(c) for c in go.team_codes)
        elif go.mode in ("score", "survivor"):
            # both pay a 1-based winning seat (effects.game_over_program)
            self._mode = 2
            self._team_slot = -1
            self._team_codes = ()
        else:
            raise ValueError(
                f"game {lowered.game.spec.name!r} terminal mode "
                f"{go.mode!r} carries no per-seat reward to search for")
        self._game = CppGame(lowered)
        self._scratch: dict[int, CppRoom] = {}  # n_players -> mirror room
        # journal header tag (server/manager.py records + verifies it on
        # replay exactly like a learned checkpoint path)
        self.ckpt_path = (f"search(rollouts={self.rollouts},"
                          f"horizon={self.horizon},salt={self.salt})")

    def _room_for(self, n_players: int) -> CppRoom:
        r = self._scratch.get(n_players)
        if r is None:
            r = self._game.room(n_players, 0)
            self._scratch[n_players] = r
        return r

    def _search_room(self, room: CppRoom, seats, seed: int) -> dict[int, int]:
        out: dict[int, int] = {}
        salt = _mix(seed, self.salt)
        for pid in seats:
            c = room.search(pid, self.rollouts, self.horizon, self._mode,
                            self._team_slot, self._team_codes, salt)
            if c != 0:
                out[pid] = c
        return out

    # -- native backend bridge (same shape as PolicyBots.native_actions) ----

    def native_actions(self, read: dict[str, Any], n_players: int,
                       seed: int = 0) -> dict[int, int]:
        """{pid: choice} for one room's read() state. Seats without a
        decision are omitted (the host then clears their action, matching
        the scripted policy's silence for those seats)."""
        room = self._room_for(n_players)
        room.write(read)
        return self._search_room(room, range(1, n_players + 1), seed)

    # -- jax backend bridge (same shape as PolicyBots.actions) --------------

    def actions(self, state) -> np.ndarray:
        """(B, P) int32 actions for a batched GameState — one native search
        per live room. O(rooms) host work: fine for the interactive hosts
        this tier serves, not for training-scale batches."""
        return self.actions_for_slots(state, None)

    def actions_for_slots(self, state, slots) -> np.ndarray:
        """Like actions(), restricted to the given slot indices (None =
        every live slot). The host passes only the slots it is stepping —
        searching a 64-slot batch for one interactive room would pay
        64x the host work (server/manager.py step_slots)."""
        P = self.lowered.P
        B = int(state.phase.shape[0])
        wanted = set(range(B)) if slots is None else {int(s) for s in slots}
        done = np.asarray(state.done)
        present = np.asarray(state.present)
        fields = {
            "bools": np.asarray(state.bools).astype(np.int32),
            "nums": np.asarray(state.nums).astype(np.int32),
            "strs": np.asarray(state.strs).astype(np.int32),
            "pdict": np.asarray(state.pdict).astype(np.int32),
            "odict": np.asarray(state.odict).astype(np.int32),
            "acted": np.asarray(state.acted).astype(np.int32),
            "choice": np.asarray(state.choice).astype(np.int32),
            "choice_phase": np.asarray(state.choice_phase).astype(np.int32),
        }
        phase = np.asarray(state.phase)
        prev = np.asarray(state.prev_phase)
        t = np.asarray(state.t)
        winner = np.asarray(state.winner)
        seeds = np.asarray(state.seed)
        out = np.zeros((B, P), np.int32)
        for b in range(B):
            if b not in wanted or done[b]:
                continue
            n = int(present[b].sum())
            if n == 0:
                continue
            room = self._room_for(n)
            room.write({
                "phase_index": int(phase[b]), "done": False,
                "winner": int(winner[b]), "prev_index": int(prev[b]),
                "t": int(t[b]),
                **{k: v[b] for k, v in fields.items()},
            })
            for pid, c in self._search_room(
                    room, range(1, n + 1), int(seeds[b])).items():
                out[b, pid - 1] = c
        return out

    def native_room_actions(self, room: CppRoom, n_players: int,
                            seed: int = 0) -> dict[int, int]:
        """Search directly on a live native room (no mirror write); the
        C++ side copies internally and never mutates it."""
        return self._search_room(room, range(1, n_players + 1), seed)


def make_search_bots(lowered, rollouts: int = 32, horizon: int = 200,
                     salt: int = 0) -> Optional[SearchBots]:
    """SearchBots, or None (with the reason logged) when the game has no
    searchable terminal rule — callers fall back to scripted bots."""
    try:
        return SearchBots(lowered, rollouts=rollouts, horizon=horizon,
                          salt=salt)
    except (ValueError, RuntimeError) as e:
        import logging

        logging.getLogger(__name__).warning("search bots unavailable: %s", e)
        return None
