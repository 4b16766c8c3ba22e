"""The jittable engine step: one fused XLA program per game turn.

Replaces the reference's 4-LLM-call pipeline per turn — BotBehavior ingest,
PhaseNode transition, RefereeNode resolution (reference:
agent/game_agent_v2.py:468-1241) — with branch-free data flow:

  atoms -> predicate values -> action acceptance -> record writes ->
  completion gate -> first-match branch select -> transition ->
  masked on-enter mechanics

Everything is elementwise ops and tiny reductions over the player axis,
batched over rooms on axis 0. No lax.switch / lax.cond: per-phase structure
is folded at trace time (compute-all, select-by-phase), which XLA fuses into
a handful of VPU kernels. Semantics are pinned P1..P15
(gamespec/mechanics.py) and must stay bit-identical to oracle/interp.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from game_engine_tpu.core.state import GameState
from game_engine_tpu.gamespec import effects as FX
from game_engine_tpu.gamespec import tables as T
from game_engine_tpu.gamespec.mechanics import ChoiceKind
from game_engine_tpu.gamespec.tables import (
    AB_BOOL,
    AB_CONST,
    AB_NUM,
    Lowered,
    OP_EQ,
    OP_GE,
    OP_GT,
    OP_LE,
    OP_NE,
)

_U32 = jnp.uint32


def splitmix32_jax(x):
    """uint32 splitmix — must match gamespec.mechanics.splitmix32 exactly."""
    x = (x + _U32(0x9E3779B9)).astype(_U32)
    z = x
    z = (z ^ (z >> 16)) * _U32(0x85EBCA6B)
    z = (z ^ (z >> 13)) * _U32(0xC2B2AE35)
    return z ^ (z >> 16)


class PredEval:
    """Lazily evaluates lowered predicates over the current state banks."""

    def __init__(self, lowered: Lowered, state: GameState):
        self.lw = lowered
        self.state = state
        self._atom_cache: dict[int, jax.Array] = {}
        self._pred_cache: dict[int, jax.Array] = {}
        B, P = state.present.shape
        self._shape = (B, P)

    def atom(self, idx: int) -> jax.Array:
        if idx in self._atom_cache:
            return self._atom_cache[idx]
        a = self.lw.atoms[idx]
        if a.bank == AB_CONST:
            v = jnp.full(self._shape, bool(a.const))
        else:
            if a.bank == AB_BOOL:
                x = self.state.bools[..., a.slot].astype(jnp.int32)
            elif a.bank == AB_NUM:
                x = self.state.nums[..., a.slot]
            else:
                x = self.state.strs[..., a.slot]
            c = jnp.int32(a.value)
            if a.op == OP_EQ:
                v = x == c
            elif a.op == OP_NE:
                v = x != c
            elif a.op == OP_GE:
                v = x >= c
            elif a.op == OP_LE:
                v = x <= c
            elif a.op == OP_GT:
                v = x > c
            else:
                v = x < c
        self._atom_cache[idx] = v
        return v

    def pred(self, idx: int) -> jax.Array:
        """(B, P) bool — does each player satisfy predicate idx."""
        if idx in self._pred_cache:
            return self._pred_cache[idx]
        terms = self.lw.preds[idx]
        if not terms:
            v = jnp.zeros(self._shape, bool)
        else:
            tvals = []
            for term in terms:
                if not term:
                    tvals.append(jnp.ones(self._shape, bool))
                else:
                    tv = self.atom(term[0])
                    for ai in term[1:]:
                        tv = tv & self.atom(ai)
                    tvals.append(tv)
            v = tvals[0]
            for tv in tvals[1:]:
                v = v | tv
        self._pred_cache[idx] = v
        return v

    def count(self, idx: int) -> jax.Array:
        """(B,) int32 — present players satisfying predicate idx."""
        return jnp.sum(self.pred(idx) & self.state.present, axis=1, dtype=jnp.int32)


def _alive(lowered: Lowered, state: GameState) -> jax.Array:
    """(B, P) — is_alive if declared, else present."""
    if lowered.alive_bool >= 0:
        return state.bools[..., lowered.alive_bool] & state.present
    return state.present


# Per-element gathers along the tiny player axis lower to very slow code on
# TPU (dynamic-index gather over a 128-padded minor dim). P is static and
# small, so all player indexing is done as one-hot contractions instead —
# pure elementwise + reduce, which the VPU eats for free.


def _player_onehot(idx0: jax.Array, P: int) -> jax.Array:
    """(..., P) bool one-hot of a 0-based player index; out-of-range -> all-false."""
    return idx0[..., None] == jnp.arange(P, dtype=jnp.int32)


def _take_player(arr: jax.Array, idx: jax.Array) -> jax.Array:
    """arr (B, P), idx (B,) 0-based -> arr[b, idx[b]] (0/False when out of range)."""
    oh = _player_onehot(idx, arr.shape[1])
    if arr.dtype == jnp.bool_:
        return jnp.any(arr & oh, axis=-1)
    return jnp.sum(jnp.where(oh, arr, 0), axis=-1)


def _gather_by_choice(vals: jax.Array, choice: jax.Array) -> jax.Array:
    """vals (B, P), choice (B, P) 1-based -> out[b, p] = vals[b, choice[b,p]-1]."""
    oh = _player_onehot(choice - 1, vals.shape[1])  # (B, P, P)
    if vals.dtype == jnp.bool_:
        return jnp.any(oh & vals[:, None, :], axis=-1)
    return jnp.sum(jnp.where(oh, vals[:, None, :], 0), axis=-1)


def _select_slot(bank: jax.Array, slot: jax.Array) -> jax.Array:
    """bank (B, P, S), slot (B,) static-small S -> (B, P) unrolled select."""
    S = bank.shape[-1]
    out = jnp.zeros(bank.shape[:-1], bank.dtype)
    for s in range(S):
        out = jnp.where((slot == s)[:, None], bank[..., s], out)
    return out


def _table_select(table: np.ndarray, idx: jax.Array) -> jax.Array:
    """Static-table row lookup by per-room index, as unrolled selects.

    TPU lowers dynamic gathers from tiny tables into slow custom calls;
    grouping rows by distinct value keeps this to a handful of selects.
    table: (N,) scalars or (N, K) rows; idx: (B,) -> (B,) or (B, K)."""
    table = np.asarray(table)
    if table.ndim == 1:
        out = jnp.full(idx.shape, table[0].item(), dtype=jnp.asarray(table).dtype)
        for v in np.unique(table)[::-1]:
            members = np.nonzero(table == v)[0]
            hit = jnp.zeros(idx.shape, bool)
            for i in members:
                hit = hit | (idx == int(i))
            out = jnp.where(hit, v.item(), out)
        return out
    # row table: dedupe identical rows
    uniq, inv = np.unique(table, axis=0, return_inverse=True)
    out = jnp.broadcast_to(jnp.asarray(uniq[0]), idx.shape + (table.shape[1],))
    for u in range(len(uniq)):
        members = np.nonzero(inv == u)[0]
        hit = jnp.zeros(idx.shape, bool)
        for i in members:
            hit = hit | (idx == int(i))
        out = jnp.where(hit[..., None], jnp.asarray(uniq[u]), out)
    return out


def _plurality(choice: jax.Array, mask: jax.Array, P: int):
    """P6: plurality over 1-based targets with lowest-id tie-break.

    Returns (target_id (B,), any_votes (B,)). jnp.argmax picks the first
    (= lowest-id) maximum, matching the oracle's counts.index(max).
    """
    oh = _player_onehot(choice - 1, P).astype(jnp.int32)
    counts = jnp.sum(oh * mask[..., None].astype(jnp.int32), axis=1)  # (B, P)
    best = jnp.max(counts, axis=1)
    tgt = jnp.argmax(counts, axis=1).astype(jnp.int32) + 1
    return jnp.where(best > 0, tgt, 0), best > 0


def _phase_mask_lookup(mask_np: np.ndarray, idx: jax.Array) -> jax.Array:
    """Membership of a (dense index, -1 allowed) array in a static phase set.

    Unrolled equality ORs over the (few) set members — avoids a dynamic
    gather entirely."""
    members = np.nonzero(mask_np)[0] - 1  # back to dense indices
    out = jnp.zeros(idx.shape, bool)
    for m in members:
        out = out | (idx == int(m))
    return out


# ---------------------------------------------------------------------------
# On-enter mechanics (P6-P11), each applied masked by `active` (B,)
# ---------------------------------------------------------------------------


def _mech_role_assign(lw: Lowered, st: GameState, pe: PredEval, active, m: T.LRoleAssign) -> GameState:
    B, P = st.present.shape
    pids = jnp.arange(P, dtype=jnp.uint32)[None, :]
    keys = splitmix32_jax(st.seed[:, None] * _U32(0x100) + pids)
    keys = jnp.where(st.present, keys, jnp.uint32(0xFFFFFFFF))
    # stable rank via O(P^2) comparisons — equals argsort-of-stable-argsort
    # but stays elementwise (TPU sorts cost ~50us/step even when masked out);
    # identical math in the pallas kernel and the C++ sim
    lt = keys[:, None, :] < keys[:, :, None]  # (B, q, p): key_q < key_p
    tie = (keys[:, None, :] == keys[:, :, None]) & (
        jnp.arange(P)[None, :, None] > jnp.arange(P)[None, None, :]
    )
    rank = jnp.sum((lt | tie).astype(jnp.int32), axis=2)  # (B, P)
    n = jnp.sum(st.present, axis=1, dtype=jnp.int32)
    codes_rows = _table_select(m.role_codes_by_n, n)  # (B, P)
    role_code = _gather_by_choice(codes_rows, rank + 1)  # (B, P)

    wmask = active[:, None] & st.present
    strs = st.strs.at[..., m.role_str_slot].set(
        jnp.where(wmask, role_code.astype(st.strs.dtype),
                  st.strs[..., m.role_str_slot])
    )
    bools, nums = st.bools, st.nums
    for code, triples in m.role_settings:
        rmask = wmask & (role_code == code)
        for bank, slot, val in triples:
            if bank == AB_BOOL:
                bools = bools.at[..., slot].set(jnp.where(rmask, val != 0, bools[..., slot]))
            elif bank == AB_NUM:
                nums = nums.at[..., slot].set(jnp.where(rmask, jnp.int32(val), nums[..., slot]))
            else:
                strs = strs.at[..., slot].set(jnp.where(rmask, jnp.asarray(val, strs.dtype), strs[..., slot]))
    return st._replace(bools=bools, nums=nums, strs=strs)


def _reset_fields(st: GameState, active, bool_slots, bool_defs, num_slots, num_defs) -> GameState:
    bools, nums = st.bools, st.nums
    a = active[:, None]
    for slot, d in zip(bool_slots, bool_defs):
        bools = bools.at[..., slot].set(jnp.where(a, bool(d), bools[..., slot]))
    for slot, d in zip(num_slots, num_defs):
        nums = nums.at[..., slot].set(jnp.where(a, jnp.int32(d), nums[..., slot]))
    return st._replace(bools=bools, nums=nums)


def _apply_death(lw: Lowered, bools: jax.Array, death: jax.Array,
                 reveal_slots) -> jax.Array:
    """death: (B, P) mask — clear is_alive and set P15 reveal flags."""
    if lw.alive_bool >= 0:
        bools = bools.at[..., lw.alive_bool].set(bools[..., lw.alive_bool] & ~death)
    for slot in reveal_slots:
        bools = bools.at[..., slot].set(bools[..., slot] | death)
    return bools


def _mech_night_resolve(lw: Lowered, st: GameState, pe: PredEval, active, m: T.LNightResolve) -> GameState:
    P = st.present.shape[1]
    kmask = _phase_mask_lookup(m.kill_phase_mask, st.choice_phase) & pe.pred(m.kill_pred) & st.present
    pmask = (
        _phase_mask_lookup(m.protect_phase_mask, st.choice_phase) & pe.pred(m.protect_pred) & st.present
    )
    kill, any_k = _plurality(st.choice, kmask, P)
    protect, _ = _plurality(st.choice, pmask, P)
    do_kill = active & any_k & (kill != protect)
    # the target-must-be-alive gate is the victim's OWN row's aliveness —
    # folding it into the row mask avoids a per-room player gather, and
    # death effects (P15 reveals) apply even without an is_alive field
    # (the oracle and C++ sim do; skipping that broke 4-way parity)
    death = _player_onehot(kill - 1, P) & do_kill[:, None] & _alive(lw, st)
    st = st._replace(bools=_apply_death(lw, st.bools, death, m.reveal_bool_slots))
    return _reset_fields(
        st, active, m.reset_bool_slots, m.reset_bool_defaults, m.reset_num_slots, m.reset_num_defaults
    )


def _mech_vote_elim(lw: Lowered, st: GameState, pe: PredEval, active, m: T.LVoteElim) -> GameState:
    P = st.present.shape[1]
    vmask = _phase_mask_lookup(m.vote_phase_mask, st.choice_phase) & pe.pred(m.voter_pred) & st.present
    tgt, any_v = _plurality(st.choice, vmask, P)
    do = active & any_v
    # target-must-be-alive gate folded into the victim row (see night resolve)
    death = _player_onehot(tgt - 1, P) & do[:, None] & _alive(lw, st)
    return st._replace(bools=_apply_death(lw, st.bools, death, m.reveal_bool_slots))


class _EffectOps:
    """Ops adapter binding the generic effect interpreter (P20,
    core/effects_exec.py) to the (rooms, players) batch layout."""

    def __init__(self, lw: Lowered, st: GameState):
        self.lw = lw
        self.st = st
        B, P = st.present.shape
        self.B, self.P = B, P
        self._seat = jnp.broadcast_to(
            jnp.arange(1, P + 1, dtype=jnp.int32)[None, :], (B, P))

    def snapshot(self):
        st = self.st
        self.sb, self.sn, self.ss = st.bools, st.nums, st.strs
        self.pe = PredEval(self.lw, st)

    def _bp(self, x):
        return jnp.broadcast_to(jnp.asarray(x, jnp.int32), (self.B, self.P))

    def field(self, bank, slot):
        if bank == FX.FXB_BOOL:
            return self.sb[..., slot].astype(jnp.int32)
        if bank == FX.FXB_NUM:
            return self.sn[..., slot]
        return self.ss[..., slot].astype(jnp.int32)

    def seat(self):
        return self._seat

    def nplayers(self):
        return jnp.sum(self.st.present, axis=1, dtype=jnp.int32)[:, None]

    def choice(self):
        return self.st.choice

    def chosein(self, lo, hi):
        bits = (int(lo) & 0xFFFFFFFF) | ((int(hi) & 0xFFFFFFFF) << 32)
        out = jnp.zeros((self.B, self.P), bool)
        for i in range(64):
            if (bits >> i) & 1:
                out = out | (self.st.choice_phase == i - 1)
        return out.astype(jnp.int32)

    def alive(self):
        if self.lw.alive_bool >= 0:
            return (self.sb[..., self.lw.alive_bool]
                    & self.st.present).astype(jnp.int32)
        return self.present_i()

    def present_i(self):
        return self.st.present.astype(jnp.int32)

    def pred(self, idx):
        return self.pe.pred(idx).astype(jnp.int32)

    def at(self, val, idx):
        idx = self._bp(idx)
        ok = _gather_by_choice(self.st.present, idx)  # absent/invalid -> False
        return jnp.where(ok, _gather_by_choice(self._bp(val), idx), 0)

    def incoming(self, val, key, mask):
        m = (self._bp(mask) != 0) & self.st.present  # (B, q)
        oh = self._bp(key)[:, :, None] == jnp.arange(
            1, self.P + 1, dtype=jnp.int32)[None, None, :]  # (B, q, p)
        contrib = jnp.where(oh & m[:, :, None], self._bp(val)[:, :, None], 0)
        return jnp.sum(contrib, axis=1)

    def eqcount(self, key, mask):
        key = self._bp(key)
        m = (self._bp(mask) != 0) & self.st.present  # (B, q)
        eq = key[:, :, None] == key[:, None, :]  # (B, p, q)
        return jnp.sum((eq & m[:, None, :]).astype(jnp.int32), axis=2)

    def rank(self, key, mask):
        key = self._bp(key)
        m = (self._bp(mask) != 0) & self.st.present
        eq = key[:, :, None] == key[:, None, :]  # (B, p, q)
        earlier = jnp.arange(self.P)[None, None, :] < jnp.arange(self.P)[None, :, None]
        return jnp.sum((eq & earlier & m[:, None, :]).astype(jnp.int32), axis=2)

    def reduce(self, kind, val, mask):
        m = (self._bp(mask) != 0) & self.st.present
        val = self._bp(val)
        if kind == FX.RED_SUM:
            return jnp.sum(jnp.where(m, val, 0), axis=1, keepdims=True)
        if kind == FX.RED_COUNT:
            return jnp.sum(m.astype(jnp.int32), axis=1, keepdims=True)
        any_m = jnp.any(m, axis=1, keepdims=True)
        if kind == FX.RED_MAX:
            best = jnp.max(jnp.where(m, val, jnp.int32(-(2**31) + 1)),
                           axis=1, keepdims=True)
        else:
            best = jnp.min(jnp.where(m, val, jnp.int32(2**31 - 1)),
                           axis=1, keepdims=True)
        return jnp.where(any_m, best, 0)

    def argbest(self, kind, key, mask):
        m = (self._bp(mask) != 0) & self.st.present
        key = self._bp(key)
        any_m = jnp.any(m, axis=1, keepdims=True)
        if kind == FX.ARG_MAX:
            best = jnp.max(jnp.where(m, key, jnp.int32(-(2**31) + 1)),
                           axis=1, keepdims=True)
        else:
            best = jnp.min(jnp.where(m, key, jnp.int32(2**31 - 1)),
                           axis=1, keepdims=True)
        win = m & (key == best)
        w = jnp.min(jnp.where(win, self._seat, self.P + 1), axis=1, keepdims=True)
        return jnp.where(any_m, w, 0)

    def stmt_mask(self, wval, active):
        return (self._bp(wval) != 0) & self.st.present & active[:, None]

    def write_bool(self, slot, val, w):
        cur = self.st.bools[..., slot]
        self.st = self.st._replace(
            bools=self.st.bools.at[..., slot].set(jnp.where(w, val != 0, cur)))

    def write_num(self, slot, val, w, add):
        cur = self.st.nums[..., slot]
        new = cur + self._bp(val) if add else self._bp(val)
        self.st = self.st._replace(
            nums=self.st.nums.at[..., slot].set(jnp.where(w, new, cur)))

    def kill(self, w, reveal_slots):
        self.st = self.st._replace(
            bools=_apply_death(self.lw, self.st.bools, w, reveal_slots))


def _mech_effects(lw: Lowered, st: GameState, pe: PredEval, active, m: T.LEffect) -> GameState:
    """P20: one generic interpreter for effect programs — income (P12),
    raids (P13), auctions (P19) and DSL-declared `effects:` all run here."""
    from game_engine_tpu.core.effects_exec import run_effect

    ops = _EffectOps(lw, st)
    run_effect(m, ops, active)
    return ops.st


def _mech_minority_score(lw: Lowered, st: GameState, pe: PredEval, active, m: T.LMinorityScore) -> GameState:
    """P16: smallest non-empty pick group scores (see SEMANTICS.md)."""
    B, P = st.present.shape
    alive = _alive(lw, st)
    picker = pe.pred(m.picker_pred) & st.present & alive
    pick = jnp.where(picker, st.nums[..., m.pick_num], 0)  # (B, P) 1-based
    counts = jnp.stack(
        [jnp.sum((pick == c + 1).astype(jnp.int32), axis=1)
         for c in range(m.n_options)],
        axis=1,
    )  # (B, C)
    nonempty = counts > 0
    n_distinct = jnp.sum(nonempty.astype(jnp.int32), axis=1)
    valid = n_distinct >= 2  # a lone group has no minority
    big = jnp.int32(2**31 - 1)
    win_count = jnp.min(jnp.where(nonempty, counts, big), axis=1)
    # lowest option index among the least-picked
    cidx = jnp.arange(m.n_options, dtype=jnp.int32)[None, :]
    win_opt = jnp.min(
        jnp.where(nonempty & (counts == win_count[:, None]), cidx, m.n_options),
        axis=1,
    ) + 1  # 1-based
    gain = (active & valid)[:, None] & (pick == win_opt[:, None])
    nums = st.nums
    nums = nums.at[..., m.score_num].set(
        nums[..., m.score_num] + gain.astype(jnp.int32)
    )
    # picks reset so stale values can't score next round
    nums = nums.at[..., m.pick_num].set(
        jnp.where(active[:, None], jnp.int32(m.pick_default), nums[..., m.pick_num])
    )
    return st._replace(nums=nums)


def _mech_bluff_challenge(lw: Lowered, st: GameState, pe: PredEval, active, m: T.LBluffChallenge) -> GameState:
    """P14: Coup-style claim/challenge resolution (see SEMANTICS.md)."""
    B, P = st.present.shape
    pid1 = jnp.arange(1, P + 1, dtype=jnp.int32)[None, :]
    alive = _alive(lw, st)
    claim_mask = pe.pred(m.claimant_pred) & st.present & alive
    claim = jnp.where(claim_mask, st.nums[..., m.claim_num], 0)  # 1-based role idx
    chal_mask = (
        _phase_mask_lookup(m.challenge_phase_mask, st.choice_phase)
        & pe.pred(m.challenger_pred) & st.present & alive
    )
    tgt = jnp.where(chal_mask & (st.choice != pid1), st.choice, 0)
    oh = _player_onehot(tgt - 1, P)  # (B, challenger, target)
    challenged = jnp.any(oh, axis=1)  # (B, P) per target
    # lowest-id challenger per target (P if none)
    qidx = jnp.arange(P, dtype=jnp.int32)[None, :, None]
    first_chal = jnp.min(jnp.where(oh, qidx, P), axis=1)  # (B, P)
    # claimed role code: claims outside the catalogue are lies
    claim_code = jnp.full((B, P), -1, jnp.int32)
    for k, code in enumerate(m.role_codes):
        claim_code = jnp.where(claim == k + 1, jnp.int32(code), claim_code)
    truth = st.strs[..., m.role_str_slot] == claim_code
    contested = challenged & (claim > 0)
    lying = contested & ~truth
    honest = contested & truth
    loss = lying.astype(jnp.int32)
    # each honest contested claim costs its lowest-id challenger one life
    chal_hit = honest[:, None, :] & (
        first_chal[:, None, :] == jnp.arange(P)[None, :, None]
    )  # (B, q, target)
    loss = loss + jnp.sum(chal_hit.astype(jnp.int32), axis=2)
    lives = st.nums[..., m.lives_num]
    new_lives = jnp.maximum(lives - loss, 0)
    act = active[:, None]
    nums = st.nums.at[..., m.lives_num].set(jnp.where(act, new_lives, lives))
    death = act & (loss > 0) & (new_lives == 0) & alive
    bools = _apply_death(lw, st.bools, death, m.reveal_bool_slots)
    return st._replace(nums=nums, bools=bools)


def _mech_guess_score(lw: Lowered, st: GameState, pe: PredEval, active, m: T.LGuessScore) -> GameState:
    B, P = st.present.shape
    sp_mask = st.bools[..., m.speaker_bool] & st.present
    has_sp = jnp.any(sp_mask, axis=1)
    sp = jnp.argmax(sp_mask, axis=1).astype(jnp.int32)  # first speaker (lowest id)
    lie = _take_player(st.nums[..., m.lie_num], sp)  # (B,)
    pidx = jnp.arange(P, dtype=jnp.int32)[None, :]
    voted = st.bools[..., m.voted_bool] if m.voted_bool >= 0 else jnp.ones((B, P), bool)
    is_voter = st.present & voted & (pidx != sp[:, None])
    correct = is_voter & (st.nums[..., m.vote_num] == lie[:, None])
    fooled = jnp.sum(is_voter & ~correct, axis=1, dtype=jnp.int32)
    act = active & has_sp
    nums = st.nums
    score = nums[..., m.score_num]
    score = score + jnp.where(act[:, None] & correct, 1, 0)
    sp_oh = jax.nn.one_hot(sp, P, dtype=jnp.int32)
    score = score + jnp.where(act[:, None], sp_oh * fooled[:, None], 0)
    nums = nums.at[..., m.score_num].set(score)
    if m.rounds_num >= 0:
        rounds = nums[..., m.rounds_num] + jnp.where(act[:, None], sp_oh, 0)
        nums = nums.at[..., m.rounds_num].set(rounds)
    return st._replace(nums=nums)


def _mech_speaker_rotate(lw: Lowered, st: GameState, pe: PredEval, active, m: T.LSpeakerRotate) -> GameState:
    B, P = st.present.shape
    rounds = st.nums[..., m.rounds_num]
    key = jnp.where(st.present, rounds, jnp.int32(2**31 - 1))
    sp = jnp.argmin(key, axis=1).astype(jnp.int32)  # first min = lowest id
    pidx = jnp.arange(P, dtype=jnp.int32)[None, :]
    is_sp = pidx == sp[:, None]
    a = active[:, None]
    bools = st.bools
    bools = bools.at[..., m.speaker_bool].set(jnp.where(a, is_sp, bools[..., m.speaker_bool]))
    if m.can_vote_bool >= 0:
        bools = bools.at[..., m.can_vote_bool].set(jnp.where(a, ~is_sp, bools[..., m.can_vote_bool]))
    st = st._replace(bools=bools)
    st = _reset_fields(
        st, active, m.reset_bool_slots, m.reset_bool_defaults, m.reset_num_slots, m.reset_num_defaults
    )
    odict, pdict = st.odict, st.pdict
    for slot in m.reset_odict_slots:
        odict = odict.at[..., slot].set(jnp.where(a, 0, odict[..., slot]))
    for slot in m.reset_pdict_slots:
        pdict = pdict.at[:, :, slot, :].set(jnp.where(a[..., None], 0, pdict[:, :, slot, :]))
    return st._replace(odict=odict, pdict=pdict)


def _mech_set_bool_all(lw: Lowered, st: GameState, pe: PredEval, active, m: T.LSetBoolAll) -> GameState:
    bools = st.bools
    wmask = active[:, None] & st.present
    for slot in m.slots:
        bools = bools.at[..., slot].set(jnp.where(wmask, True, bools[..., slot]))
    return st._replace(bools=bools)


def _mech_game_over(lw: Lowered, st: GameState, pe: PredEval, active, m: T.LGameOver) -> GameState:
    B, P = st.present.shape
    if m.mode == "team" and m.team_str_slot >= 0 and m.team_codes:
        alive = _alive(lw, st)
        counts = jnp.stack(
            [
                jnp.sum(alive & (st.strs[..., m.team_str_slot] == code), axis=1, dtype=jnp.int32)
                for code in m.team_codes
            ],
            axis=1,
        )  # (B, NT) minority-first
        best = jnp.max(counts, axis=1, keepdims=True)
        win = jnp.argmax(counts == best, axis=1).astype(jnp.int32) + 1
    elif m.mode == "survivor":
        alive = _alive(lw, st)
        any_alive = jnp.any(alive, axis=1)
        win = jnp.where(any_alive, jnp.argmax(alive, axis=1).astype(jnp.int32) + 1, 0)
    elif m.mode == "score" and m.score_num >= 0:
        score = jnp.where(st.present, st.nums[..., m.score_num], jnp.int32(-(2**31) + 1))
        win = jnp.argmax(score, axis=1).astype(jnp.int32) + 1  # first max = lowest id
    else:
        win = jnp.zeros((B,), jnp.int32)
    return st._replace(
        done=st.done | active,
        winner=jnp.where(active, win, st.winner),
    )


_MECH_FNS = {
    T.LRoleAssign: _mech_role_assign,
    T.LNightResolve: _mech_night_resolve,
    T.LVoteElim: _mech_vote_elim,
    T.LGuessScore: _mech_guess_score,
    T.LSpeakerRotate: _mech_speaker_rotate,
    T.LSetBoolAll: _mech_set_bool_all,
    T.LGameOver: _mech_game_over,
    T.LBluffChallenge: _mech_bluff_challenge,
    T.LMinorityScore: _mech_minority_score,
    T.LEffect: _mech_effects,
}


def apply_on_enter(lowered: Lowered, state: GameState, entered: jax.Array, new_phase: jax.Array) -> GameState:
    """Apply every mechanic masked by (entered & phase match).

    Predicates used by mechanics are evaluated on the state at entry time;
    mechanics within one phase are independent by construction (the
    analyzer never emits intra-phase pred dependencies).
    """
    pe = PredEval(lowered, state)
    for mech in lowered.mechanics:
        active = entered & (new_phase == mech.phase_index)
        state = _MECH_FNS[type(mech)](lowered, state, pe, active, mech)
    return state


# ---------------------------------------------------------------------------
# Branch conditions (room level)
# ---------------------------------------------------------------------------


def _eval_cond(cond, pe: PredEval, st: GameState) -> jax.Array:
    if isinstance(cond, T.LAlways):
        return jnp.ones((st.present.shape[0],), bool)
    if isinstance(cond, T.LAnd):
        v = _eval_cond(cond.items[0], pe, st)
        for c in cond.items[1:]:
            v = v & _eval_cond(c, pe, st)
        return v
    if isinstance(cond, T.LPrevPhaseIn):
        return _phase_mask_lookup(cond.mask, st.prev_phase)
    if isinstance(cond, T.LAllPresent):
        n = jnp.sum(st.present, axis=1, dtype=jnp.int32)
        return pe.count(cond.pred) == n
    if isinstance(cond, T.LCountCmp):
        lhs = pe.count(cond.left_pred)
        rhs = jnp.int32(cond.right_const) if cond.right_pred < 0 else pe.count(cond.right_pred)
        return {
            "eq": lhs == rhs,
            "ne": lhs != rhs,
            "ge": lhs >= rhs,
            "le": lhs <= rhs,
            "gt": lhs > rhs,
            "lt": lhs < rhs,
        }[cond.op]
    raise TypeError(cond)


# ---------------------------------------------------------------------------
# The step
# ---------------------------------------------------------------------------


def make_step(lowered: Lowered):
    """Build step(state, actions) -> state. actions: (B, P) int32, 0 = none."""
    NP, P = lowered.NP, lowered.P

    def step(state: GameState, actions: jax.Array) -> GameState:
        B = state.present.shape[0]
        pe_pre = PredEval(lowered, state)

        # --- per-room phase gathers (unrolled selects; see _table_select) ---
        ph = state.phase
        is_action = _table_select(lowered.phase_is_action, ph)  # (B,)
        kind = _table_select(lowered.choice_kind, ph)
        kmax = _table_select(lowered.choice_max, ph)
        n_present = jnp.sum(state.present, axis=1, dtype=jnp.int32)

        # target predicate of the current phase, per room (P3): select over
        # the distinct predicates only (no (B, P, NP) stack materialized)
        target = jnp.zeros(state.present.shape, bool)
        by_pred: dict[int, list[int]] = {}
        for i, pi in enumerate(lowered.phase_target_pred):
            by_pred.setdefault(int(pi), []).append(i)
        for pi, phase_idxs in by_pred.items():
            hit = jnp.zeros(ph.shape, bool)
            for i in phase_idxs:
                hit = hit | (ph == i)
            target = jnp.where(hit[:, None], pe_pre.pred(pi), target)
        targeted = target & state.present

        # --- action legality (P1/P2) ---
        c = actions.astype(jnp.int32)
        alive = _alive(lowered, state)
        tgt_alive = _gather_by_choice(alive, c)  # all-false when c out of range
        in_players = (c >= 1) & (c <= P)
        target_ok = in_players & tgt_alive
        hi = jnp.where(kmax > 0, kmax, n_present)[:, None]
        option_ok = (c >= 1) & (c <= hi)
        kind_b = kind[:, None]
        legal = jnp.where(
            kind_b == ChoiceKind.TARGET.value,
            target_ok,
            jnp.where(
                kind_b == ChoiceKind.OPTION.value,
                option_ok,
                kind_b == ChoiceKind.SUBMIT.value,  # SUBMIT: any nonzero
            ),
        )
        accept = (
            is_action[:, None]
            & ~state.done[:, None]
            & targeted
            & ~state.acted
            & (c != 0)
            & legal
        )
        c_norm = jnp.where(kind_b == ChoiceKind.SUBMIT.value, 1, c)

        # --- record writes ---
        rec_t = _table_select(lowered.rec_bool_true, ph)[:, None, :]  # (B,1,NB)
        rec_f = _table_select(lowered.rec_bool_false, ph)[:, None, :]
        am = accept[..., None]
        bools = jnp.where(am & rec_t, True, state.bools)
        bools = jnp.where(am & rec_f, False, bools)

        NN = state.nums.shape[-1]
        num_sel = jax.nn.one_hot(_table_select(lowered.rec_num_slot, ph), NN, dtype=bool)[:, None, :]
        nums = jnp.where(am & num_sel, c_norm[..., None], state.nums)

        # pdict write: field[target] = target's source-string value
        pd_slot = _table_select(lowered.rec_pdict_slot, ph)  # (B,)
        pd_src = _table_select(lowered.rec_pdict_src, ph)
        NPD = state.pdict.shape[2]
        # target's value of the per-room source slot (unrolled selects —
        # dynamic player-axis gathers are pathologically slow on TPU)
        src_bank = _select_slot(state.strs, pd_src)  # (B, P)
        src_val = _gather_by_choice(src_bank, c)  # (B, P) target's code
        # translate source string codes into the pdict field's value vocab
        trans_rows = _table_select(lowered.rec_pdict_trans, ph)  # (B, MAXV)
        MAXV = trans_rows.shape[1]
        src_tr = jnp.zeros_like(src_val)
        for v in range(MAXV):
            src_tr = jnp.where(src_val == v, trans_rows[:, v][:, None], src_tr)
        src_val = jnp.where(pd_src[:, None] >= 0, src_tr, 0)
        pd_oh = jax.nn.one_hot(pd_slot, NPD, dtype=bool)[:, None, :, None]  # (B,1,NPD,1)
        tgt_oh = _player_onehot(c - 1, P)[:, :, None, :]
        pd_mask = am[..., None] & pd_oh & tgt_oh & (pd_slot >= 0)[:, None, None, None]
        pdict = jnp.where(pd_mask, src_val.astype(state.pdict.dtype)[..., None, None], state.pdict)

        NOD = state.odict.shape[2]
        od_oh = jax.nn.one_hot(_table_select(lowered.rec_odict_slot, ph), NOD, dtype=bool)[:, None, :]
        odict = jnp.where(am & od_oh, 1, state.odict)

        acted = state.acted | accept
        choice = jnp.where(accept, c_norm, state.choice)
        choice_phase = jnp.where(accept, ph[:, None], state.choice_phase)

        state = state._replace(
            bools=bools, nums=nums, pdict=pdict, odict=odict,
            acted=acted, choice=choice, choice_phase=choice_phase,
        )

        # --- completion (P3) on post-ingest state ---
        pe = PredEval(lowered, state)
        need = targeted & ~acted
        complete = jnp.where(is_action, ~jnp.any(need, axis=1), True) & ~state.done

        # --- next-phase select (P4/P5): static map + branch overrides ---
        next_idx = _table_select(lowered.phase_static_next, ph)
        for i in range(NP):
            if lowered.branches[i]:
                nxt = jnp.full((B,), lowered.branches[i][-1][1], jnp.int32)  # P5 fallback
                for cond, tgt_idx in reversed(lowered.branches[i]):
                    nxt = jnp.where(_eval_cond(cond, pe, state), jnp.int32(tgt_idx), nxt)
                next_idx = jnp.where(ph == i, nxt, next_idx)

        trans = complete & (next_idx != ph)
        prev_phase = jnp.where(trans, ph, state.prev_phase)
        new_phase = jnp.where(trans, next_idx, ph)
        acted = jnp.where(trans[:, None], False, state.acted)
        state = state._replace(
            phase=new_phase, prev_phase=prev_phase, acted=acted, t=state.t + 1
        )

        # --- on-enter mechanics of the newly-entered phase ---
        return apply_on_enter(lowered, state, trans, new_phase)

    return step


_jit_cache: dict[int, object] = {}


def jit_step(lowered: Lowered):
    """jit-compiled step for a lowered game (cached per Lowered identity)."""
    key = id(lowered)
    if key not in _jit_cache:
        _jit_cache[key] = jax.jit(make_step(lowered), donate_argnums=(0,))
    return _jit_cache[key]
