"""Plain-Python interpreter of a CompiledGame — the semantics oracle.

Readable and slow: one room, dict-based player states, direct IR evaluation.
The jitted engine (core/step.py) must produce bit-identical
phase/vote/state/win traces against this interpreter; golden-parity tests
enforce that (SURVEY.md §4, BASELINE.json north star). The reference system
it determinizes is the LangGraph node pipeline
Router -> BotBehavior -> PhaseNode -> Referee -> ActionExecutor
(reference: agent/game_agent_v2.py:1570-1587); one ``step()`` here equals one
reference game turn.

All semantic rules implemented here are the pinned P1..P11 semantics
documented in gamespec/mechanics.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

from game_engine_tpu.gamespec import conditions as C
from game_engine_tpu.gamespec import effects as FX
from game_engine_tpu.gamespec import mechanics as M
from game_engine_tpu.gamespec.compile import CompiledGame, CompiledPhase
from game_engine_tpu.gamespec.expr import eval_predicate
from game_engine_tpu.gamespec.mechanics import ChoiceKind
from game_engine_tpu.gamespec.schema import CompletionType, FieldType


@dataclasses.dataclass
class OracleTrace:
    """Per-step observable record used by parity tests."""

    phase_id: int
    done: bool
    winner: int
    alive: tuple[bool, ...]
    acted: tuple[bool, ...]


class OracleRoom:
    """One game room interpreted in plain Python."""

    def __init__(self, game: CompiledGame, n_players: int, seed: int = 0):
        assert 1 <= n_players <= game.config.max_players
        self.game = game
        self.n = n_players
        self.seed = seed
        decl = game.spec.declaration

        self.players: dict[int, dict[str, Any]] = {}
        for pid in range(1, n_players + 1):
            row: dict[str, Any] = {}
            for f in decl.fields:
                if f.type in (FieldType.DICT,):
                    row[f.name] = {}
                elif f.type is FieldType.ARRAY:
                    row[f.name] = []
                else:
                    row[f.name] = f.default
            if "name" in row and not row["name"]:
                row["name"] = f"Player {pid}"
            self.players[pid] = row

        self.phase: CompiledPhase = game.phases[game.start_index]
        self.prev_phase_id: Optional[int] = None
        self.done = False
        self.winner = 0
        self.step_count = 0
        self.acted: set[int] = set()
        self.choice: dict[int, int] = {}
        self.choice_phase: dict[int, int] = {}
        # on-enter mechanics of the start phase
        self._apply_on_enter(self.phase)

    # -- predicates --------------------------------------------------------

    def _match(self, pred, pid: int) -> bool:
        return eval_predicate(pred, self.players[pid])

    def _targets(self, phase: CompiledPhase) -> list[int]:
        return [p for p in range(1, self.n + 1) if self._match(phase.target_pred, p)]

    # -- action acceptance (P1/P2) ------------------------------------------

    def _legal_choice(self, rp: M.RecordProgram, choice: int) -> Optional[int]:
        if rp.choice_kind is ChoiceKind.TARGET:
            if 1 <= choice <= self.n:
                tgt = self.players[choice]
                if "is_alive" not in tgt or tgt["is_alive"]:
                    return choice
            return None
        if rp.choice_kind is ChoiceKind.OPTION:
            hi = rp.choice_max if rp.choice_max > 0 else self.n
            return choice if 1 <= choice <= hi else None
        if rp.choice_kind is ChoiceKind.SUBMIT:
            return 1
        return None

    def _accept(self, pid: int, choice: int) -> bool:
        phase = self.phase
        if phase.completion is not CompletionType.PLAYER_ACTION:
            return False
        if pid in self.acted or not self._match(phase.target_pred, pid):
            return False
        rp = phase.program.record
        c = self._legal_choice(rp, choice)
        if c is None:
            return False
        row = self.players[pid]
        for f in rp.set_bool_true:
            row[f] = True
        for f in rp.set_bool_false:
            row[f] = False
        if rp.write_choice_num:
            row[rp.write_choice_num] = c
        if rp.write_pdict:
            field, src = rp.write_pdict
            if 1 <= c <= self.n:
                val = self.players[c].get(src, "") if src else ""
                row[field] = dict(row[field])
                row[field][str(c)] = val
        if rp.mark_odict:
            row[rp.mark_odict] = {"1": "submitted"}
        self.acted.add(pid)
        self.choice[pid] = c
        self.choice_phase[pid] = phase.dsl_id
        return True

    # -- resolution mechanics (P6-P11) ---------------------------------------

    def _plurality(self, votes: list[int]) -> int:
        """P6: plurality with lowest-id tie-break; 0 if no votes."""
        if not votes:
            return 0
        counts = [0] * (self.n + 1)
        for v in votes:
            if 1 <= v <= self.n:
                counts[v] += 1
        best = max(counts)
        if best == 0:
            return 0
        return counts.index(best)  # lowest index with max count

    def _choices_from(self, phases: frozenset[int], pred) -> list[int]:
        out = []
        for p in range(1, self.n + 1):
            if self.choice_phase.get(p) in phases and self._match(pred, p):
                out.append(self.choice[p])
        return out

    def _apply_on_enter(self, phase: CompiledPhase) -> None:
        for mech in phase.program.on_enter:
            self.apply_mechanic(mech)

    def apply_mechanic(self, mech) -> None:
        """Apply ONE analyzer mechanic to the live room (tests use this to
        hand-check pinned semantics on crafted states)."""
        if isinstance(mech, M.RoleAssign):
            self._role_assign(mech)
        elif isinstance(mech, M.NightResolve):
            self._night_resolve(mech)
        elif isinstance(mech, M.VoteElim):
            self._vote_elim(mech)
        elif isinstance(mech, M.ResourceIncome):
            self._apply_effects(FX.income_program(mech.gains), ())
        elif isinstance(mech, M.ResourceRaid):
            self._apply_effects(
                FX.raid_program(mech.raid_phases, mech.raider_pred,
                                mech.res_field), ())
        elif isinstance(mech, M.BluffChallenge):
            self._bluff_challenge(mech)
        elif isinstance(mech, M.MinorityScore):
            self._minority_score(mech)
        elif isinstance(mech, M.AuctionScore):
            try:
                bid_default = int(
                    self.game.spec.declaration.field(mech.bid_field).default)
            except (TypeError, ValueError):
                bid_default = 0
            self._apply_effects(
                FX.auction_program(mech.bid_field, mech.bidder_pred,
                                   mech.res_field, mech.prize_field,
                                   bid_default), ())
        elif isinstance(mech, M.Effects):
            self._apply_effects(mech.program, mech.reveal_bools)
        elif isinstance(mech, M.GuessScore):
            self._guess_score(mech)
        elif isinstance(mech, M.SpeakerRotate):
            self._speaker_rotate(mech)
        elif isinstance(mech, M.SetBoolAll):
            for pid in self.players:
                for f in mech.fields:
                    self.players[pid][f] = True
        elif isinstance(mech, M.GameOver):
            self._game_over(mech)

    def _role_assign(self, ra: M.RoleAssign) -> None:
        multiset = M.role_multiset(ra, self.n)
        perm = M.role_permutation(self.seed, self.n)
        settings = dict(ra.role_fields)
        for p in range(self.n):
            role = multiset[perm[p]]
            row = self.players[p + 1]
            row[ra.role_field] = role
            for fname, val in settings.get(role, ()):
                row[fname] = val

    def _kill(self, pid: int, reveal_bools) -> None:
        """P15: death clears is_alive and reveals the role flags."""
        row = self.players[pid]
        if "is_alive" in row:
            row["is_alive"] = False
        for f in reveal_bools:
            row[f] = True

    def _night_resolve(self, nr: M.NightResolve) -> None:
        kill = self._plurality(self._choices_from(nr.kill_phases, nr.kill_pred))
        protect = self._plurality(self._choices_from(nr.protect_phases, nr.protect_pred))
        if kill and kill != protect and self.players[kill].get("is_alive", True):
            self._kill(kill, nr.reveal_bools)
        decl = self.game.spec.declaration
        for pid in self.players:
            for f in nr.reset_bools:
                self.players[pid][f] = decl.field(f).default
            for f in nr.reset_nums:
                self.players[pid][f] = decl.field(f).default

    def _vote_elim(self, ve: M.VoteElim) -> None:
        target = self._plurality(self._choices_from(ve.vote_phases, ve.voter_pred))
        if target and self.players[target].get("is_alive", True):
            self._kill(target, ve.reveal_bools)

    # -- generic effect interpreter (P20) ------------------------------------
    #
    # ONE interpreter executes every effect program: the analyzer's P12
    # income / P13 raid / P19 auction re-expressions and any DSL-declared
    # `mechanics: [{effects: [...]}]` program. Within a block, every
    # expression reads the block-entry snapshot; writes land in statement
    # order; blocks sequence (SEMANTICS.md P20).

    def _fx_eval(self, e, p: int, snap: dict[int, dict]) -> int:
        ev = self._fx_eval
        layout = self.game.layout
        if isinstance(e, FX.EConst):
            return e.value
        if isinstance(e, FX.EField):
            slot = layout.get(e.name)
            v = snap[p].get(e.name)
            if slot is not None and slot.bank == "str":
                return slot.encode(v)
            if isinstance(v, bool):
                return 1 if v else 0
            try:
                return int(v or 0)
            except (TypeError, ValueError):
                return 0
        if isinstance(e, FX.ESeat):
            return p
        if isinstance(e, FX.ENPlayers):
            return self.n
        if isinstance(e, FX.EChoice):
            return self.choice.get(p, 0)
        if isinstance(e, FX.EChoseIn):
            return 1 if self.choice_phase.get(p) in e.phases else 0
        if isinstance(e, FX.EAlive):
            return 1 if snap[p].get("is_alive", True) else 0
        if isinstance(e, FX.EPresent):
            return 1
        if isinstance(e, FX.EPredRef):
            return 1 if eval_predicate(e.pred, snap[p]) else 0
        if isinstance(e, FX.EBin):
            a, b = ev(e.a, p, snap), ev(e.b, p, snap)
            return {"add": a + b, "sub": a - b, "mul": a * b,
                    "min": min(a, b), "max": max(a, b)}[e.op]
        if isinstance(e, FX.ECmp):
            a, b = e.a, e.b
            if isinstance(a, FX.EStrLit) and isinstance(b, FX.EField):
                a, b = b, a
            if isinstance(b, FX.EStrLit):
                bv = layout.slot(a.name).encode(b.value)
                av = ev(a, p, snap)
            else:
                av, bv = ev(a, p, snap), ev(b, p, snap)
            return int({"eq": av == bv, "ne": av != bv, "ge": av >= bv,
                        "le": av <= bv, "gt": av > bv, "lt": av < bv}[e.op])
        if isinstance(e, FX.ENot):
            return int(ev(e.a, p, snap) == 0)
        if isinstance(e, FX.EAnd):
            return int(ev(e.a, p, snap) != 0 and ev(e.b, p, snap) != 0)
        if isinstance(e, FX.EOr):
            return int(ev(e.a, p, snap) != 0 or ev(e.b, p, snap) != 0)
        if isinstance(e, FX.EWhere):
            return ev(e.a, p, snap) if ev(e.c, p, snap) != 0 else ev(e.b, p, snap)
        if isinstance(e, FX.EAt):
            i = ev(e.idx, p, snap)
            return ev(e.val, i, snap) if 1 <= i <= self.n else 0
        if isinstance(e, FX.EIncoming):
            total = 0
            for q in range(1, self.n + 1):
                if ev(e.mask, q, snap) != 0 and ev(e.key, q, snap) == p:
                    total += ev(e.val, q, snap)
            return total
        if isinstance(e, FX.EEqCount):
            kp = ev(e.key, p, snap)
            return sum(1 for q in range(1, self.n + 1)
                       if ev(e.mask, q, snap) != 0 and ev(e.key, q, snap) == kp)
        if isinstance(e, FX.ERank):
            kp = ev(e.key, p, snap)
            return sum(1 for q in range(1, p)
                       if ev(e.mask, q, snap) != 0 and ev(e.key, q, snap) == kp)
        if isinstance(e, FX.EReduce):
            vals = [ev(e.val, q, snap) for q in range(1, self.n + 1)
                    if ev(e.mask, q, snap) != 0]
            if e.kind == "sum":
                return sum(vals)
            if e.kind == "count":
                return len(vals)
            if not vals:
                return 0  # empty max/min pins to 0 (P20)
            return max(vals) if e.kind == "max" else min(vals)
        if isinstance(e, FX.EArgBest):
            pairs = [(q, ev(e.key, q, snap)) for q in range(1, self.n + 1)
                     if ev(e.mask, q, snap) != 0]
            if not pairs:
                return 0
            best = (max if e.kind == "max" else min)(v for _, v in pairs)
            return min(q for q, v in pairs if v == best)  # ties to lowest seat
        raise TypeError(e)

    def _apply_effects(self, program, reveal_bools) -> None:
        for block in program:
            snap = {q: dict(self.players[q]) for q in self.players}
            for st in block:
                for p in range(1, self.n + 1):
                    if self._fx_eval(st.where, p, snap) == 0:
                        continue
                    if isinstance(st, FX.SKill):
                        self._kill(p, reveal_bools)
                        continue
                    v = self._fx_eval(st.value, p, snap)
                    row = self.players[p]
                    if isinstance(st, FX.SAdd):
                        row[st.field] = int(row.get(st.field, 0) or 0) + v
                    elif self.game.layout.slot(st.field).bank == "bool":
                        row[st.field] = v != 0
                    else:
                        row[st.field] = v

    def _minority_score(self, ms: M.MinorityScore) -> None:
        """P16: smallest non-empty pick group scores (SEMANTICS.md)."""
        picks: dict[int, int] = {}
        for p in range(1, self.n + 1):
            row = self.players[p]
            if not row.get("is_alive", True):
                continue
            if self._match(ms.picker_pred, p):
                c = int(row.get(ms.pick_field, 0) or 0)
                if 1 <= c <= ms.n_options:
                    picks[p] = c
        counts: dict[int, int] = {}
        for c in picks.values():
            counts[c] = counts.get(c, 0) + 1
        if len(counts) >= 2:  # a lone group has no minority
            win_count = min(counts.values())
            win_opt = min(c for c, n in counts.items() if n == win_count)
            for p, c in picks.items():
                if c == win_opt:
                    self.players[p][ms.score_field] = (
                        int(self.players[p].get(ms.score_field, 0) or 0) + 1
                    )
        default = self.game.spec.declaration.field(ms.pick_field).default
        for p in range(1, self.n + 1):
            self.players[p][ms.pick_field] = default

    def _bluff_challenge(self, bc: M.BluffChallenge) -> None:
        """P14: Coup-style claim/challenge resolution (SEMANTICS.md)."""
        roles = [r.name for r in self.game.spec.declaration.roles]
        claim: dict[int, int] = {}
        for p in range(1, self.n + 1):
            row = self.players[p]
            if not row.get("is_alive", True):
                continue
            if self._match(bc.claimant_pred, p):
                claim[p] = int(row.get(bc.claim_field, 0) or 0)
        challengers: dict[int, list[int]] = {}  # target -> challengers
        for q in range(1, self.n + 1):
            row = self.players[q]
            if not row.get("is_alive", True):
                continue
            if self.choice_phase.get(q) in bc.challenge_phases and self._match(bc.challenger_pred, q):
                t = self.choice.get(q, 0)
                if 1 <= t <= self.n and t != q:  # self-challenge void
                    challengers.setdefault(t, []).append(q)
        loss = {p: 0 for p in range(1, self.n + 1)}
        for p, k in claim.items():
            if p not in challengers or k <= 0:
                continue  # unchallenged or no claim: nothing happens
            # claims outside the role catalogue are lies
            truthful = 1 <= k <= len(roles) and \
                str(self.players[p].get(bc.role_field, "")) == roles[k - 1]
            if truthful:
                loss[min(challengers[p])] += 1  # lowest-id challenger pays
            else:
                loss[p] += 1
        for p in range(1, self.n + 1):
            if loss[p] == 0:
                continue
            lives = int(self.players[p].get(bc.lives_field, 0) or 0)
            new_lives = max(lives - loss[p], 0)
            self.players[p][bc.lives_field] = new_lives
            if new_lives == 0 and self.players[p].get("is_alive", True):
                self._kill(p, bc.reveal_bools)

    def _guess_score(self, gs: M.GuessScore) -> None:
        speakers = [p for p in range(1, self.n + 1) if gs.speaker_field and self.players[p].get(gs.speaker_field)]
        if not speakers:
            return
        sp = speakers[0]
        lie = self.players[sp].get(gs.lie_field, 0)
        fooled = 0
        for p in range(1, self.n + 1):
            if p == sp:
                continue
            row = self.players[p]
            if gs.voted_field and not row.get(gs.voted_field):
                continue
            if row.get(gs.vote_field, 0) == lie:
                row[gs.score_field] = row.get(gs.score_field, 0) + 1
            else:
                fooled += 1
        self.players[sp][gs.score_field] = self.players[sp].get(gs.score_field, 0) + fooled
        if gs.rounds_field:
            self.players[sp][gs.rounds_field] = self.players[sp].get(gs.rounds_field, 0) + 1

    def _speaker_rotate(self, sr: M.SpeakerRotate) -> None:
        decl = self.game.spec.declaration
        # next speaker: min rounds, tie -> lowest id (P9)
        rounds = [(self.players[p].get(sr.rounds_field, 0), p) for p in range(1, self.n + 1)]
        speaker = min(rounds)[1]
        for p in range(1, self.n + 1):
            row = self.players[p]
            row[sr.speaker_field] = p == speaker
            if sr.can_vote_field:
                row[sr.can_vote_field] = p != speaker
            for f in sr.reset_bools:
                row[f] = decl.field(f).default
            for f in sr.reset_nums:
                row[f] = decl.field(f).default
            for f in sr.reset_odicts:
                row[f] = {}
            for f in sr.reset_pdicts:
                row[f] = {}

    def _game_over(self, go: M.GameOver) -> None:
        self.done = True
        if go.mode == "team":
            counts = []
            for ti, team in enumerate(go.team_order):
                c = sum(
                    1
                    for p in self.players.values()
                    if str(p.get(go.team_field, "")).lower() == team and p.get("is_alive", True)
                )
                counts.append((c, ti))
            # max alive count; ties favor minority team = earliest in order
            best = max(c for c, _ in counts)
            for c, ti in counts:
                if c == best:
                    self.winner = ti + 1
                    break
        elif go.mode == "survivor":
            alive = [p for p in range(1, self.n + 1) if self.players[p].get("is_alive", True)]
            self.winner = alive[0] if alive else 0  # last one standing (lowest id)
        elif go.mode == "score":
            scores = [(-self.players[p].get(go.score_field, 0), p) for p in range(1, self.n + 1)]
            self.winner = min(scores)[1]
        else:
            self.winner = 0

    # -- transition (P3/P4/P5) ------------------------------------------------

    def _complete(self) -> bool:
        if self.phase.completion is CompletionType.PLAYER_ACTION:
            return all(p in self.acted for p in self._targets(self.phase))
        return True  # UI_displayed / timer auto-complete (P3)

    def _select_next(self) -> Optional[int]:
        phase = self.phase
        if phase.terminal:
            return None
        if phase.branches:
            for b in phase.branches:
                if C.eval_condition(b.cond, self.players, self.prev_phase_id):
                    return b.next_index
            return phase.branches[-1].next_index  # P5 fallback
        return phase.next_index

    def step(self, actions: Optional[dict[int, int]] = None) -> OracleTrace:
        """One engine step = one reference game turn.

        ``actions``: player id -> choice int (P2 encoding). Illegal or
        ineligible actions are silently ignored (the referee's invalid-vote
        rule, reference: agent/prompt/referee_system_prompt_1.txt:45-51).
        """
        self.step_count += 1
        if not self.done:
            if actions:
                for pid in sorted(actions):
                    if 1 <= pid <= self.n:
                        self._accept(pid, int(actions[pid]))
            if self._complete():
                nxt = self._select_next()
                if nxt is not None and nxt != self.phase.index:
                    self.prev_phase_id = self.phase.dsl_id
                    self.phase = self.game.phases[nxt]
                    self.acted = set()
                    self._apply_on_enter(self.phase)
        return self.trace()

    def trace(self) -> OracleTrace:
        return OracleTrace(
            phase_id=self.phase.dsl_id,
            done=self.done,
            winner=self.winner,
            alive=tuple(bool(self.players[p].get("is_alive", True)) for p in range(1, self.n + 1)),
            acted=tuple(p in self.acted for p in range(1, self.n + 1)),
        )

    # -- introspection helpers (tests / projection) ----------------------------

    def field_values(self, name: str) -> list[Any]:
        return [self.players[p].get(name) for p in range(1, self.n + 1)]

    def snapshot(self) -> dict[str, Any]:
        """AgentState-shaped dict (reference: src/lib/canvas/types.ts:338-360)."""
        return {
            "player_states": {str(p): dict(self.players[p]) for p in range(1, self.n + 1)},
            "current_phase_id": self.phase.dsl_id,
            "current_phase_name": self.phase.name,
            "done": self.done,
            "winner": self.winner,
        }
