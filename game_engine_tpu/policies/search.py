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

from game_engine_tpu.gamespec.mechanics import splitmix32
from game_engine_tpu.native.lib import CppGame, CppRoom


def _mix(a: int, b: int) -> int:
    """Cheap 32-bit mix for the per-call salt (not a semantics surface —
    any deterministic function works; the C++ side mixes further)."""
    x = ((a & 0xFFFFFFFF) * 0x9E3779B9 + (b & 0xFFFFFFFF) * 0x85EBCA6B)
    return x & 0xFFFFFFFF


def _perm_order(seed: int, k: int) -> list[int]:
    """Deterministic permutation of range(k): argsort of splitmix32 keys
    (ties by index) — the same construction as mechanics.role_permutation,
    so the determinizer's shuffles are backend-independent integer math."""
    return sorted(range(k), key=lambda j: (splitmix32((seed * 0x100 + j)
                                                      & 0xFFFFFFFF), j))


class Determinizer:
    """Information-set resampler for the determinized search tier.

    The full-information search reads the TRUE room state — fine as an
    engine-side referee bot, but it "cheats" relative to the reference's
    LLM bots, which only see their own prompt view (reference:
    agent/game_agent_v2.py:496-520 builds the bot prompt from player_states
    the frontend would show that seat). This class samples worlds a given
    searcher cannot distinguish from the truth under the EXACT observation
    mask the learned policy uses (policies/net.py observe / mask_for):

      * PUBLIC fields, alive flags, phase, the searcher's own row, and
        (role/team of) reveal-flagged seats are copied unchanged;
      * hidden columns are jointly RELABELED among the seats they are
        hidden from — one permutation per hidden-seat group, so every
        per-seat bundle of hidden values (role+team; private bookkeeping
        + dict rows + pending choices) moves together and the sampled
        world is internally consistent within each group;
      * the identity group (role/team + any TEAM-visible field) excludes
        seats the searcher coordinates with (the minority-team rule) and
        reveal-flagged seats, mirroring observe()'s mask exactly.

    Sampling hidden columns by relabeling preserves their multiset — the
    public composition knowledge every player has from the DSL's role
    declaration — which makes this the uniform-determinization scheme of
    classic imperfect-information search (re-dealing unseen cards).
    """

    def __init__(self, lowered):
        from game_engine_tpu.policies.net import (
            _REVEAL_RE,
            _phase_public_acting,
            VIS_PUBLIC,
            VIS_TEAM,
            field_visibility,
            minority_team_code,
        )

        lay = lowered.game.layout
        self.lowered = lowered
        vis = field_visibility(lowered)
        self.minority = minority_team_code(lowered)
        ts = lay.get("team")
        self.team_idx = ts.index if (ts is not None and ts.bank == "str") else None
        self.reveal_idx = None
        for f in lowered.game.spec.declaration.fields:
            if _REVEAL_RE.search(f.name):
                rs = lay.get(f.name)
                if rs is not None and rs.bank == "bool":
                    self.reveal_idx = rs.index
                    break
        self.pub_acting = _phase_public_acting(lowered)
        # hidden slots, split into the identity group (role/team family +
        # TEAM-visible fields: hidden-set excludes coordinated/revealed
        # seats) and the plain private group (hidden from every other seat)
        self.ident_slots: list[tuple[str, int]] = []
        self.self_slots: list[tuple[str, int]] = []
        for f in lowered.game.spec.declaration.fields:
            v = vis.get(f.name, VIS_PUBLIC)
            if v == VIS_PUBLIC:
                continue
            s = lay.get(f.name)
            if s is None or s.bank not in ("bool", "num", "str", "pdict", "odict"):
                continue
            if f.name in ("role", "team") or v == VIS_TEAM:
                self.ident_slots.append((s.bank, s.index))
            else:
                self.self_slots.append((s.bank, s.index))

    def _hidden_seats(self, st: dict, p0: int, n: int) -> tuple[list[int], list[int]]:
        """(ident_group, self_group) 0-based seat lists hidden from p0."""
        others = [q for q in range(n) if q != p0]
        strs = np.asarray(st["strs"])
        bools = np.asarray(st["bools"])
        ident = []
        for q in others:
            if self.reveal_idx is not None and bools[q, self.reveal_idx]:
                continue  # P15: revealed seats' role/team is public
            if (self.minority is not None and self.team_idx is not None
                    and int(strs[p0, self.team_idx]) == self.minority
                    and int(strs[q, self.team_idx]) == int(strs[p0, self.team_idx])):
                continue  # the coordinating minority team sees its teammates
            ident.append(q)
        return ident, others

    def apply(self, st: dict, p0: int, n: int, dseed: int) -> dict:
        """One determinized copy of state dict `st` for searcher seat p0."""
        arrays = ("bools", "nums", "strs", "pdict", "odict",
                  "acted", "choice", "choice_phase")
        out = dict(st)
        for k in arrays:
            out[k] = np.array(st[k], copy=True)
        ident, selfg = self._hidden_seats(st, p0, n)

        def relabel(seats: list[int], slots: list[tuple[str, int]],
                    extras: bool, salt: int) -> None:
            if len(seats) < 2:
                return
            order = _perm_order(_mix(dseed, salt), len(seats))
            src = [seats[o] for o in order]
            for bank, idx in slots:
                a = out[{"bool": "bools", "num": "nums", "str": "strs",
                         "pdict": "pdict", "odict": "odict"}[bank]]
                a0 = np.array(a, copy=True)
                if bank == "pdict":
                    a[seats, idx, :] = a0[src, idx, :]
                elif bank == "odict":
                    a[seats, idx] = a0[src, idx]
                else:
                    a[seats, idx] = a0[src, idx]
            if extras:
                # pending decisions are private until resolved; who-acted
                # is public exactly when the phase selects actors by
                # public fields (net._phase_public_acting)
                for key in ("choice", "choice_phase"):
                    a = out[key]
                    a0 = np.array(a, copy=True)
                    a[seats] = a0[src]
                if not bool(self.pub_acting[int(st["phase_index"])]):
                    a = out["acted"]
                    a0 = np.array(a, copy=True)
                    a[seats] = a0[src]

        if ident == selfg:
            # the searcher coordinates with nobody (majority case): ONE
            # permutation moves each seat's whole hidden bundle together —
            # role, team, and the private bookkeeping correlated with it
            relabel(selfg, self.ident_slots + self.self_slots,
                    extras=True, salt=0x1DE47)
        else:
            # minority searcher: teammates' identity is visible (excluded
            # from the identity relabel) but their private bookkeeping is
            # still hidden — the groups differ, so cross-group correlation
            # is approximated (each group stays internally consistent)
            relabel(ident, self.ident_slots, extras=False, salt=0x1DE47)
            relabel(selfg, self.self_slots, extras=True, salt=0x5E1F5)
        return out


class SearchBots:
    """Per-game lookahead actor with the same serving interface as
    policies/serve.py PolicyBots (native_actions / actions), so the host's
    per-seat scripted/learned/search mixing works unchanged."""

    def __init__(self, lowered, rollouts: int = 32, horizon: int = 200,
                 salt: int = 0, determinize: int = 0):
        self.lowered = lowered
        self.rollouts = int(rollouts)
        self.horizon = int(horizon)
        self.salt = int(salt)
        # determinize=D>0: INFORMATION-SET search — score every candidate
        # in D hidden-state determinizations sampled under the searcher's
        # own observation mask (class Determinizer) and argmax the summed
        # totals, instead of reading the true state (full-information
        # lookahead). D=0 keeps the original full-information tier.
        self.determinize = int(determinize)
        self._det = Determinizer(lowered) if self.determinize > 0 else None
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
        self._det_scratch: dict[int, CppRoom] = {}  # determinized worlds
        # journal header tag (server/manager.py records + verifies it on
        # replay exactly like a learned checkpoint path). det=0 keeps the
        # original format so pre-existing journals still verify.
        det_tag = f",det={self.determinize}" if self.determinize > 0 else ""
        self.ckpt_path = (f"search(rollouts={self.rollouts},"
                          f"horizon={self.horizon},salt={self.salt}{det_tag})")

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

    def _det_room_for(self, n_players: int) -> CppRoom:
        r = self._det_scratch.get(n_players)
        if r is None:
            r = self._game.room(n_players, 0)
            self._det_scratch[n_players] = r
        return r

    def _search_room_det(self, st: dict, n: int, seats, seed: int) -> dict[int, int]:
        """Information-set decision: per seat, sum each candidate's rollout
        score over `determinize` sampled worlds and take the first
        strictly-best candidate in ascending order (the same tie rule as
        the C++ argmax). Deterministic in (state, seed, config) — the same
        journal-replay contract as the full-information tier."""
        out: dict[int, int] = {}
        base = _mix(seed, self.salt)
        room = self._det_room_for(n)
        for pid in seats:
            totals: dict[int, int] = {}
            decided = False
            for d in range(self.determinize):
                dseed = _mix(base, (pid * 0x01000193 + d) & 0xFFFFFFFF)
                st_d = self._det.apply(st, pid - 1, n, dseed)
                room.write(st_d)
                sc = room.search_scores(
                    pid, self.rollouts, self.horizon, self._mode,
                    self._team_slot, self._team_codes,
                    _mix(base, (0xD0000001 + d) & 0xFFFFFFFF))
                if sc is None:
                    break  # no decision: invariant across worlds (the
                    # searcher's own row and public state never move)
                decided = True
                for c, s in sc.items():
                    totals[c] = totals.get(c, 0) + s
            if not decided or not totals:
                continue
            best_c = 0
            best_s = 0
            any_ = False
            for c in sorted(totals):
                if not any_ or totals[c] > best_s:
                    best_c, best_s, any_ = c, totals[c], True
            if best_c != 0:
                out[pid] = best_c
        return out

    # -- native backend bridge (same shape as PolicyBots.native_actions) ----

    def native_actions(self, read: dict[str, Any], n_players: int,
                       seed: int = 0) -> dict[int, int]:
        """{pid: choice} for one room's read() state. Seats without a
        decision are omitted (the host then clears their action, matching
        the scripted policy's silence for those seats)."""
        if self.determinize > 0:
            return self._search_room_det(
                read, n_players, range(1, n_players + 1), seed)
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
            st = {
                "phase_index": int(phase[b]), "done": False,
                "winner": int(winner[b]), "prev_index": int(prev[b]),
                "t": int(t[b]),
                **{k: v[b] for k, v in fields.items()},
            }
            if self.determinize > 0:
                found = self._search_room_det(st, n, range(1, n + 1),
                                              int(seeds[b]))
            else:
                room = self._room_for(n)
                room.write(st)
                found = self._search_room(room, range(1, n + 1), int(seeds[b]))
            for pid, c in found.items():
                out[b, pid - 1] = c
        return out

    def native_room_actions(self, room: CppRoom, n_players: int,
                            seed: int = 0) -> dict[int, int]:
        """Search directly on a live native room (no mirror write); the
        C++ side copies internally and never mutates it."""
        if self.determinize > 0:
            return self._search_room_det(room.read(), n_players,
                                         range(1, n_players + 1), seed)
        return self._search_room(room, range(1, n_players + 1), seed)


def make_search_bots(lowered, rollouts: int = 32, horizon: int = 200,
                     salt: int = 0, determinize: int = 0) -> Optional[SearchBots]:
    """SearchBots, or None (with the reason logged) when the game has no
    searchable terminal rule — callers fall back to scripted bots."""
    try:
        return SearchBots(lowered, rollouts=rollouts, horizon=horizon,
                          salt=salt, determinize=determinize)
    except (ValueError, RuntimeError) as e:
        import logging

        logging.getLogger(__name__).warning("search bots unavailable: %s", e)
        return None
