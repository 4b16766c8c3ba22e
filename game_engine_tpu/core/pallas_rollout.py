"""Pallas fused multi-step rollout kernel.

The XLA scan rollout round-trips the room state through HBM on every step
(~30 small fusions/step, ~115M steps/s at 65k rooms). This kernel runs K
steps entirely in VMEM: the grid tiles rooms into blocks of R lanes, each
kernel instance loads its block's state once, iterates policy+step K times
with rooms on the lane dimension and the (static, tiny) player axis
unrolled, and writes the final state back — one HBM round trip per K steps.

Layout: every per-player quantity is an (..., P, R) tile — P=8 sublanes,
R lanes — the native (8,128) tiling, zero padding. Per-room scalars are
(1, R) rows. All per-phase structure (record masks, choice kinds, branch
conditions, mechanics) folds at trace time into unrolled equality-selects,
the same trick as core/step.py.

Mosaic constraints honored throughout (found the hard way):
  * booleans are only ever comparison *masks* (i1) combined with &|~ or
    reduced; every select VALUE operand and every stored array is int32
    (i1 stacks/relayouts and bool-valued broadcasts crash the compiler);
  * no cumsum (static prefix sums), no captured array constants
    (broadcasted_iota + scalar selects instead).

Semantics are bit-identical to the engine's auto-reset rollout
(core/engine.py make_rollout): same pinned P1..P11 rules, same splitmix32
policy stream, same reset seeding — enforced by tests/test_pallas.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from game_engine_tpu.core.state import GameState
from game_engine_tpu.core.effects_exec import run_effect
from game_engine_tpu.gamespec import effects as FXE
from game_engine_tpu.gamespec import tables as T
from game_engine_tpu.gamespec.mechanics import ChoiceKind
from game_engine_tpu.gamespec.tables import AB_BOOL, AB_CONST, AB_NUM, Lowered
from game_engine_tpu.gamespec.tables import OP_EQ, OP_GE, OP_GT, OP_LE, OP_LT, OP_NE

_U32 = jnp.uint32
_GOLDEN = 0x9E3779B9
_MIX = 0x85EBCA6B
# the shared splitmix32 mixer — one definition for all executors' RNG contract
from game_engine_tpu.core.step import (  # noqa: E402
    _phase_mask_lookup,
    splitmix32_jax as _mix,
)


def _b2i(x):
    """bool mask -> int32 0/1 (selects with typed scalars are Mosaic-safe)."""
    return jnp.where(x, jnp.int32(1), jnp.int32(0))


def make_pallas_rollout(lowered: Lowered, num_steps: int, block_rooms: int = 256,
                        interpret: bool = False):
    """Build rollout(state) -> (state, episodes) running K fused steps."""
    lw = lowered
    P, NP = lw.P, lw.NP
    lay = lw.game.layout
    NB, NN, NS = lay.n_bool, lay.n_num, lay.n_str
    NPD, NOD = lay.n_pdict, lay.n_odict
    R = block_rooms
    START = lw.game.start_index

    bool_defaults = [int(bool(x)) for x in lw.bool_defaults]
    num_defaults = [int(x) for x in lw.num_defaults]
    str_defaults = [int(x) for x in lw.str_defaults]

    # ------------- trace-time helpers: masks are i1, values are i32 --------

    def table_sel(table, ph):
        """Static (NP,) table -> per-room (1,R) int32 via unrolled selects."""
        table = np.asarray(table)
        out = jnp.full(ph.shape, int(table.flat[0]), jnp.int32)
        for v in np.unique(table)[::-1]:
            hit = jnp.zeros(ph.shape, bool)
            for i in np.nonzero(table == v)[0]:
                hit = hit | (ph == int(i))
            out = jnp.where(hit, int(v), out)
        return out

    def pred_eval(pred_idx: int, blist, nlist, slist):
        """(P, R) i1 mask for lowered predicate pred_idx (banks are i32)."""
        terms = lw.preds[pred_idx]
        shape = (P, R)
        if not terms:
            return jnp.zeros(shape, bool)

        def atom(ai):
            a = lw.atoms[ai]
            if a.bank == AB_CONST:
                return jnp.full(shape, bool(a.const))
            if a.bank == AB_BOOL:
                x = blist[a.slot]
            elif a.bank == AB_NUM:
                x = nlist[a.slot]
            else:
                x = slist[a.slot]
            c = jnp.int32(a.value)
            return {
                OP_EQ: x == c, OP_NE: x != c, OP_GE: x >= c,
                OP_LE: x <= c, OP_GT: x > c, OP_LT: x < c,
            }[a.op]

        v = None
        for term in terms:
            tv = None
            for ai in term:
                av = atom(ai)
                tv = av if tv is None else (tv & av)
            if tv is None:
                tv = jnp.ones(shape, bool)
            v = tv if v is None else (v | tv)
        return v

    def count_mask(mask):
        return jnp.sum(_b2i(mask), axis=0, keepdims=True)  # (1, R)

    # shared with the scan executor — one copy of the (NP+1)-offset
    # membership decoding (step._phase_mask_lookup is shape-agnostic)
    phase_in = _phase_mask_lookup

    def gather_by_choice_i(vals_i, choice):
        """vals (P,R) i32, choice (P,R) 1-based -> per-chooser vals[choice-1]."""
        out = jnp.zeros((P, R), jnp.int32)
        for q in range(P):
            out = jnp.where(choice == q + 1, vals_i[q : q + 1], out)
        return out


    def prow():
        return jax.lax.broadcasted_iota(jnp.int32, (P, R), 0)

    # ------------- branch conditions -----------------------------------------

    def eval_cond(cond, blist, nlist, slist, present, prev, n_present):
        if isinstance(cond, T.LAlways):
            return jnp.ones((1, R), bool)
        if isinstance(cond, T.LAnd):
            v = eval_cond(cond.items[0], blist, nlist, slist, present, prev, n_present)
            for cc in cond.items[1:]:
                v = v & eval_cond(cc, blist, nlist, slist, present, prev, n_present)
            return v
        if isinstance(cond, T.LPrevPhaseIn):
            return phase_in(cond.mask, prev)
        if isinstance(cond, T.LAllPresent):
            return count_mask(pred_eval(cond.pred, blist, nlist, slist) & present) == n_present
        if isinstance(cond, T.LCountCmp):
            lhs = count_mask(pred_eval(cond.left_pred, blist, nlist, slist) & present)
            rhs = (jnp.int32(cond.right_const) if cond.right_pred < 0
                   else count_mask(pred_eval(cond.right_pred, blist, nlist, slist) & present))
            return {"eq": lhs == rhs, "ne": lhs != rhs, "ge": lhs >= rhs,
                    "le": lhs <= rhs, "gt": lhs > rhs, "lt": lhs < rhs}[cond.op]
        raise TypeError(cond)

    # ------------- generic effect interpreter (P20) ---------------------------

    class _FxOps:
        """Ops adapter binding core/effects_exec.run_effect to the Pallas
        (P, R) tile layout — values i32, masks transient i1, everything
        unrolled over the static player axis (Mosaic discipline)."""

        def __init__(self, st):
            self.st = st

        def snapshot(self):
            self.sb = list(self.st["blist"])
            self.sn = list(self.st["nlist"])
            self.ss = list(self.st["slist"])

        def _bpr(self, x):
            return jnp.zeros((P, R), jnp.int32) + x

        def field(self, bank, slot):
            if bank == FXE.FXB_BOOL:
                return self.sb[slot]
            if bank == FXE.FXB_NUM:
                return self.sn[slot]
            return self.ss[slot]

        def seat(self):
            return prow() + 1

        def nplayers(self):
            return count_mask(self.st["present"])

        def choice(self):
            return self.st["choice"]

        def chosein(self, lo, hi):
            bits = (int(lo) & 0xFFFFFFFF) | ((int(hi) & 0xFFFFFFFF) << 32)
            out = jnp.zeros((P, R), bool)
            for i in range(64):
                if (bits >> i) & 1:
                    out = out | (self.st["chphase"] == i - 1)
            return _b2i(out)

        def alive(self):
            if lw.alive_bool >= 0:
                return _b2i((self.sb[lw.alive_bool] != 0) & self.st["present"])
            return self.present_i()

        def present_i(self):
            return _b2i(self.st["present"])

        def pred(self, idx):
            return _b2i(pred_eval(idx, self.sb, self.sn, self.ss))

        def at(self, val, idx):
            valb, idxb = self._bpr(val), self._bpr(idx)
            present = self.st["present"]
            out = jnp.zeros((P, R), jnp.int32)
            for q in range(P):
                hit = (idxb == q + 1) & present[q : q + 1]
                out = jnp.where(hit, valb[q : q + 1], out)
            return out

        def incoming(self, val, key, mask):
            valb, keyb = self._bpr(val), self._bpr(key)
            mb = (self._bpr(mask) != 0) & self.st["present"]
            rows = []
            for p in range(P):
                s = jnp.zeros((1, R), jnp.int32)
                for q in range(P):
                    s = s + jnp.where(mb[q : q + 1] & (keyb[q : q + 1] == p + 1),
                                      valb[q : q + 1], 0)
                rows.append(s)
            return jnp.concatenate(rows, axis=0)

        def eqcount(self, key, mask):
            keyb = self._bpr(key)
            mb = (self._bpr(mask) != 0) & self.st["present"]
            rows = []
            for p in range(P):
                s = jnp.zeros((1, R), jnp.int32)
                for q in range(P):
                    s = s + _b2i(mb[q : q + 1]
                                 & (keyb[q : q + 1] == keyb[p : p + 1]))
                rows.append(s)
            return jnp.concatenate(rows, axis=0)

        def rank(self, key, mask):
            keyb = self._bpr(key)
            mb = (self._bpr(mask) != 0) & self.st["present"]
            rows = []
            for p in range(P):
                s = jnp.zeros((1, R), jnp.int32)
                for q in range(p):
                    s = s + _b2i(mb[q : q + 1]
                                 & (keyb[q : q + 1] == keyb[p : p + 1]))
                rows.append(s)
            return jnp.concatenate(rows, axis=0)

        def reduce(self, kind, val, mask):
            mb = (self._bpr(mask) != 0) & self.st["present"]
            valb = self._bpr(val)
            if kind == FXE.RED_SUM:
                return jnp.sum(jnp.where(mb, valb, 0), axis=0, keepdims=True)
            if kind == FXE.RED_COUNT:
                return count_mask(mb)
            any_m = jnp.any(mb, axis=0, keepdims=True)
            if kind == FXE.RED_MAX:
                # exact INT32_MIN sentinel, matching step.py/oracle/C++
                best = jnp.max(jnp.where(mb, valb, jnp.int32(-(2**31))),
                               axis=0, keepdims=True)
            else:
                best = jnp.min(jnp.where(mb, valb, jnp.int32(2**31 - 1)),
                               axis=0, keepdims=True)
            return jnp.where(any_m, best, 0)

        def argbest(self, kind, key, mask):
            mb = (self._bpr(mask) != 0) & self.st["present"]
            keyb = self._bpr(key)
            any_m = jnp.any(mb, axis=0, keepdims=True)
            if kind == FXE.ARG_MAX:
                # exact INT32_MIN sentinel ('exact for ALL int32 keys',
                # matching step.py's argbest — ADVICE r3)
                best = jnp.max(jnp.where(mb, keyb, jnp.int32(-(2**31))),
                               axis=0, keepdims=True)
            else:
                best = jnp.min(jnp.where(mb, keyb, jnp.int32(2**31 - 1)),
                               axis=0, keepdims=True)
            win = mb & (keyb == best)
            w = jnp.min(jnp.where(win, prow() + 1, P + 1), axis=0, keepdims=True)
            return jnp.where(any_m, w, 0)

        def deal(self, table, salt):
            """ST_DEAL (P10 as IR): multiset code by splitmix32-key rank,
            unrolled over the static player axis — bit-identical to
            step.py's deal and the retired LRoleAssign kernel (salt 0)."""
            present = self.st["present"]
            pid_c = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0).astype(_U32)
            saltu = self._bpr(salt).astype(_U32)
            keys = _mix(self.st["seed"] * _U32(0x100) + pid_c
                        + saltu * _U32(0x9E3779B9))
            keys = jnp.where(present, keys, _U32(0xFFFFFFFF))
            rows = []
            for p in range(P):
                r_p = jnp.zeros((1, R), jnp.int32)
                for q in range(P):
                    if q == p:
                        continue
                    less = keys[q : q + 1] < keys[p : p + 1]
                    tie = (keys[q : q + 1] == keys[p : p + 1]) & (q < p)
                    r_p = r_p + _b2i(less | tie)
                rows.append(r_p)
            rank = jnp.concatenate(rows, axis=0)  # (P, R)
            n_present = count_mask(present)
            prow_c = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
            tab = np.asarray(table, dtype=np.int32)
            codes_rows = jnp.zeros((P, R), jnp.int32)
            for n in range(1, P + 1):
                row_const = jnp.zeros((P, 1), jnp.int32)
                for p in range(P):
                    code = int(tab[n, p])
                    if code:
                        row_const = jnp.where(prow_c == p, code, row_const)
                codes_rows = jnp.where(n_present == n, row_const, codes_rows)
            code = jnp.zeros((P, R), jnp.int32)
            for rr in range(P):
                code = jnp.where(rank == rr, codes_rows[rr : rr + 1], code)
            return code

        def stmt_mask(self, wval, active):
            return (self._bpr(wval) != 0) & self.st["present"] & active

        def write_bool(self, slot, val, w):
            cur = self.st["blist"][slot]
            self.st["blist"][slot] = jnp.where(w, _b2i(self._bpr(val) != 0), cur)

        def write_num(self, slot, val, w, add):
            cur = self.st["nlist"][slot]
            new = cur + self._bpr(val) if add else self._bpr(val)
            self.st["nlist"][slot] = jnp.where(w, new, cur)

        def write_str(self, slot, val, w):
            cur = self.st["slist"][slot]
            self.st["slist"][slot] = jnp.where(w, self._bpr(val), cur)

        def write_pdict(self, slot, key, val, w):
            # pdict[seat][key] = val; unrolled select over the static key
            # axis (key 0 / absent-seat keys write nothing — pinned 1..n)
            keyb = self._bpr(key)
            valb = self._bpr(val)
            for q in range(P):
                cur = self.st["pd"][slot][q]
                q_present = self.st["present"][q : q + 1]  # (1, R)
                self.st["pd"][slot][q] = jnp.where(
                    w & (keyb == q + 1) & q_present, valb, cur)

        def reset_dict(self, bank, slot, w):
            if bank == FXE.FXB_ODICT:
                self.st["od"][slot] = jnp.where(w, 0, self.st["od"][slot])
            else:
                for q in range(P):
                    self.st["pd"][slot][q] = jnp.where(
                        w, 0, self.st["pd"][slot][q])

        def kill(self, w, reveal_slots):
            if lw.alive_bool >= 0:
                self.st["blist"][lw.alive_bool] = jnp.where(
                    w, 0, self.st["blist"][lw.alive_bool])
            for slot in reveal_slots:
                self.st["blist"][slot] = jnp.where(w, 1, self.st["blist"][slot])

        def game_over(self, val, w):
            # ST_OVER: done + winner from the lowest-seat row (seat 1)
            trigger = w[0:1]  # (1, R)
            v0 = self._bpr(val)[0:1]
            self.st["done"] = self.st["done"] | trigger
            self.st["winner"] = jnp.where(trigger, v0, self.st["winner"])

    # ------------- mechanics (st holds i32 banks + i1 done) -------------------

    def apply_mechanics(st, entered, ph):
        for m in lw.mechanics:
            active = entered & (ph == m.phase_index)  # (1, R) i1
            # P20: ONE generic effect interpreter runs every mechanic —
            # including the P11/P17 terminal winner programs (ST_OVER) and
            # the P10 role deal (ST_DEAL); all bespoke branches are deleted
            run_effect(m, _FxOps(st), active)

    # ------------- the kernel ------------------------------------------------

    def kernel(bools_ref, nums_ref, strs_ref, pdict_ref, odict_ref,
               present_ref, regs_ref, scal_ref,
               bools_o, nums_o, strs_o, pdict_o, odict_o,
               present_o, regs_o, scal_o, eps_o):
        bools_o[:] = bools_ref[:]
        nums_o[:] = nums_ref[:]
        strs_o[:] = strs_ref[:]
        pdict_o[:] = pdict_ref[:]
        odict_o[:] = odict_ref[:]
        present_o[:] = present_ref[:]
        regs_o[:] = regs_ref[:]
        scal_o[:] = scal_ref[:]
        eps_o[:] = jnp.zeros_like(eps_o)

        def body(_, carry):
            boolsb = bools_o[:]  # (NB, P, R) i32
            numsb = nums_o[:]
            strsb = strs_o[:]
            pdictb = pdict_o[:]
            odictb = odict_o[:]
            present = present_o[:] != 0  # (P, R) i1
            regs = regs_o[:]
            acted_i = regs[0]  # (P, R) i32
            choice = regs[1]
            chphase = regs[2]
            scal = scal_o[:]
            ph = scal[0:1]
            prev = scal[1:2]
            done = scal[2:3] != 0
            winner = scal[3:4]
            t = scal[4:5]
            seed = jax.lax.bitcast_convert_type(scal[5:6], jnp.uint32)

            blist = [boolsb[i] for i in range(NB)]
            nlist = [numsb[i] for i in range(NN)]
            slist = [strsb[i] for i in range(NS)]
            pd_list = [[pdictb[f, :, q] for q in range(P)] for f in range(NPD)]
            od_list = [odictb[s] for s in range(NOD)]
            n_present = count_mask(present)
            alive = ((blist[lw.alive_bool] != 0) & present) if lw.alive_bool >= 0 else present
            alive_i = _b2i(alive)
            n_alive = count_mask(alive)

            is_action = table_sel(lw.phase_is_action.astype(np.int32), ph) != 0
            kind = table_sel(lw.choice_kind, ph)
            kmax = table_sel(lw.choice_max, ph)

            # target predicate of the current phase (i32 accumulate)
            target_i = jnp.zeros((P, R), jnp.int32)
            by_pred: dict[int, list[int]] = {}
            for i, pi in enumerate(lw.phase_target_pred):
                by_pred.setdefault(int(pi), []).append(i)
            for pi, idxs in by_pred.items():
                hit = jnp.zeros(ph.shape, bool)
                for i in idxs:
                    hit = hit | (ph == i)
                target_i = jnp.where(hit, _b2i(pred_eval(pi, blist, nlist, slist)), target_i)
            targeted = (target_i != 0) & present

            # ---- scripted policy ----
            h0 = _mix(seed * _U32(_MIX) + t.astype(_U32))
            pid_const = (jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0).astype(_U32) + _U32(1))
            h = _mix(h0 ^ (pid_const * _U32(_GOLDEN)))
            k = jnp.where(n_alive > 0, h % jnp.maximum(n_alive, 1).astype(_U32), 0).astype(jnp.int32)
            cum_rows, run = [], jnp.zeros((1, R), jnp.int32)
            for q in range(P):
                run = run + alive_i[q : q + 1]
                cum_rows.append(run)
            cum = jnp.concatenate(cum_rows, axis=0)
            tgt_choice = jnp.zeros((P, R), jnp.int32)
            for q in range(P):
                hit = (alive_i[q : q + 1] != 0) & (cum[q : q + 1] == k + 1)
                tgt_choice = jnp.where(hit, q + 1, tgt_choice)
            tgt_choice = jnp.where(n_alive > 0, tgt_choice, 0)
            hi = jnp.where(kmax > 0, kmax, n_present)
            opt_choice = 1 + (h % jnp.maximum(hi, 1).astype(_U32)).astype(jnp.int32)
            c = jnp.where(
                kind == ChoiceKind.TARGET.value, tgt_choice,
                jnp.where(kind == ChoiceKind.OPTION.value, opt_choice,
                          jnp.where(kind == ChoiceKind.SUBMIT.value, 1, 0)),
            )
            c = jnp.where(present, c, 0)

            # ---- acceptance (P1/P2) ----
            tgt_alive = gather_by_choice_i(alive_i, c) != 0
            target_ok = (c >= 1) & (c <= P) & tgt_alive
            option_ok = (c >= 1) & (c <= hi)
            legal = jnp.where(
                kind == ChoiceKind.TARGET.value, _b2i(target_ok),
                jnp.where(kind == ChoiceKind.OPTION.value, _b2i(option_ok),
                          _b2i(kind == ChoiceKind.SUBMIT.value)),
            ) != 0
            accept = is_action & ~done & targeted & (acted_i == 0) & (c != 0) & legal
            c_norm = jnp.where(kind == ChoiceKind.SUBMIT.value, 1, c)

            # ---- record writes ----
            for b in range(NB):
                col_t = table_sel(lw.rec_bool_true[:, b].astype(np.int32), ph) != 0
                col_f = table_sel(lw.rec_bool_false[:, b].astype(np.int32), ph) != 0
                blist[b] = jnp.where(accept & col_t, 1, blist[b])
                blist[b] = jnp.where(accept & col_f, 0, blist[b])
            rec_num = table_sel(lw.rec_num_slot, ph)
            for s in range(NN):
                nlist[s] = jnp.where(accept & (rec_num == s), c_norm, nlist[s])
            pd_slot = table_sel(lw.rec_pdict_slot, ph)
            pd_src = table_sel(lw.rec_pdict_src, ph)
            src_bank = jnp.zeros((P, R), jnp.int32)
            for s in range(NS):
                src_bank = jnp.where(pd_src == s, slist[s], src_bank)
            src_val = gather_by_choice_i(src_bank, c)
            MAXV = lw.rec_pdict_trans.shape[1]
            src_tr = jnp.zeros_like(src_val)
            for v in range(MAXV):
                row = table_sel(lw.rec_pdict_trans[:, v], ph)
                src_tr = jnp.where(src_val == v, row, src_tr)
            src_val = jnp.where(pd_src >= 0, src_tr, 0)
            for f in range(NPD):
                for q in range(P):
                    w = accept & (pd_slot == f) & (c == q + 1)
                    pd_list[f][q] = jnp.where(w, src_val, pd_list[f][q])
            rec_od = table_sel(lw.rec_odict_slot, ph)
            for s in range(NOD):
                od_list[s] = jnp.where(accept & (rec_od == s), 1, od_list[s])

            acted_i = jnp.where(accept, 1, acted_i)
            choice = jnp.where(accept, c_norm, choice)
            chphase = jnp.where(accept, ph, chphase)

            # ---- completion + next select (P3/P4/P5) ----
            need = targeted & (acted_i == 0)
            complete = jnp.where(is_action,
                                 _b2i(~jnp.any(need, axis=0, keepdims=True)),
                                 jnp.int32(1)) != 0
            complete = complete & ~done
            next_idx = table_sel(lw.phase_static_next, ph)
            for i in range(NP):
                if lw.branches[i]:
                    nxt = jnp.full(ph.shape, lw.branches[i][-1][1], jnp.int32)
                    for cond, tgt_i in reversed(lw.branches[i]):
                        cv = eval_cond(cond, blist, nlist, slist, present, prev, n_present)
                        nxt = jnp.where(cv, jnp.int32(tgt_i), nxt)
                    next_idx = jnp.where(ph == i, nxt, next_idx)
            trans = complete & (next_idx != ph)
            prev = jnp.where(trans, ph, prev)
            ph = jnp.where(trans, next_idx, ph)
            acted_i = jnp.where(trans, 0, acted_i)
            t = t + 1

            # ---- on-enter mechanics ----
            st = dict(blist=blist, nlist=nlist, slist=slist, pd=pd_list, od=od_list,
                      present=present, choice=choice, chphase=chphase,
                      done=done, winner=winner, seed=seed)
            apply_mechanics(st, trans, ph)
            done, winner = st["done"], st["winner"]

            # ---- episodes + auto-reset ----
            # count only fresh completions (done transitioning false->true
            # this step) — a room that was BORN done (an instant-end
            # start-phase `over`, re-set by the post-reset apply_mechanics
            # below) carries done=true into this iteration and must not be
            # recounted; engine.py counts `new.done & ~st.done` identically
            done_in = scal[2:3] != 0
            eps_o[:] = eps_o[:] + _b2i(done & ~done_in)
            new_seed = _mix(seed ^ _U32(0xDECAF000))
            for b in range(NB):
                blist[b] = jnp.where(done, bool_defaults[b], blist[b])
            for s in range(NN):
                nlist[s] = jnp.where(done, num_defaults[s], nlist[s])
            for s in range(NS):
                slist[s] = jnp.where(done, str_defaults[s], slist[s])
            for f in range(NPD):
                for q in range(P):
                    pd_list[f][q] = jnp.where(done, 0, pd_list[f][q])
            for s in range(NOD):
                od_list[s] = jnp.where(done, 0, od_list[s])
            acted_i = jnp.where(done, 0, acted_i)
            choice = jnp.where(done, 0, choice)
            chphase = jnp.where(done, -1, chphase)
            ph = jnp.where(done, START, ph)
            prev = jnp.where(done, -1, prev)
            t = jnp.where(done, 0, t)
            winner = jnp.where(done, 0, winner)
            seed = jnp.where(done, new_seed, seed)
            st = dict(blist=blist, nlist=nlist, slist=slist, pd=pd_list, od=od_list,
                      present=present, choice=choice, chphase=chphase,
                      done=jnp.zeros((1, R), bool), winner=winner, seed=seed)
            apply_mechanics(st, done, ph)
            winner = st["winner"]
            done = st["done"]

            # ---- write back (all i32) ----
            bools_o[:] = jnp.stack(blist)
            nums_o[:] = jnp.stack(nlist)
            strs_o[:] = jnp.stack(slist)
            # pd_list[f][q] is (P_owner, R); stack targets on axis 1 ->
            # (NPD, P_owner, P_target, R)
            pdict_o[:] = jnp.stack([jnp.stack(rows, axis=1) for rows in pd_list])
            odict_o[:] = jnp.stack(od_list)
            regs_o[:] = jnp.stack([acted_i, choice, chphase])
            scal_o[:] = jnp.concatenate([
                ph, prev, _b2i(done), winner, t,
                jax.lax.bitcast_convert_type(seed, jnp.int32),
            ], axis=0)
            return carry

        jax.lax.fori_loop(0, num_steps, body, 0)

    # ------------- host wrapper ------------------------------------------------

    def to_minor(state: GameState):
        return (
            jnp.transpose(state.bools, (2, 1, 0)).astype(jnp.int32),  # (NB,P,B)
            jnp.transpose(state.nums, (2, 1, 0)),
            jnp.transpose(state.strs, (2, 1, 0)).astype(jnp.int32),
            jnp.transpose(state.pdict, (2, 1, 3, 0)).astype(jnp.int32),  # (NPD,Po,Pt,B)
            jnp.transpose(state.odict, (2, 1, 0)).astype(jnp.int32),
            jnp.transpose(state.present, (1, 0)).astype(jnp.int32),
            jnp.stack([
                jnp.transpose(state.acted, (1, 0)).astype(jnp.int32),
                jnp.transpose(state.choice, (1, 0)),
                jnp.transpose(state.choice_phase, (1, 0)),
            ]),
            jnp.stack([
                state.phase, state.prev_phase, state.done.astype(jnp.int32),
                state.winner, state.t,
                jax.lax.bitcast_convert_type(state.seed, jnp.int32),
            ]),
        )

    def from_minor(arrs, like: GameState) -> GameState:
        bools, nums, strs, pdict, odict, present, regs, scal = arrs
        return GameState(
            bools=jnp.transpose(bools, (2, 1, 0)).astype(bool),
            nums=jnp.transpose(nums, (2, 1, 0)),
            strs=jnp.transpose(strs, (2, 1, 0)).astype(jnp.int8),
            pdict=jnp.transpose(pdict, (3, 1, 0, 2)).astype(jnp.int8),
            odict=jnp.transpose(odict, (2, 1, 0)).astype(jnp.int8),
            present=jnp.transpose(present, (1, 0)).astype(bool),
            phase=scal[0], prev_phase=scal[1], done=scal[2].astype(bool),
            winner=scal[3], t=scal[4],
            seed=jax.lax.bitcast_convert_type(scal[5], jnp.uint32),
            acted=jnp.transpose(regs[0], (1, 0)).astype(bool),
            choice=jnp.transpose(regs[1], (1, 0)),
            choice_phase=jnp.transpose(regs[2], (1, 0)),
        )

    def rollout(state: GameState):
        B = state.present.shape[0]
        assert B % R == 0, f"batch {B} must be a multiple of block_rooms {R}"
        arrs = to_minor(state)
        grid = (B // R,)

        def bs(shape_prefix):
            nd = len(shape_prefix)
            return pl.BlockSpec(
                shape_prefix + (R,),
                (lambda *i: (0,) * nd + (i[0],)),
                memory_space=pltpu.VMEM,
            )

        in_specs = [
            bs((NB, P)), bs((NN, P)), bs((NS, P)), bs((NPD, P, P)), bs((NOD, P)),
            bs((P,)), bs((3, P)), bs((6,)),
        ]
        out_specs = in_specs + [bs((1,))]
        out_shapes = [jax.ShapeDtypeStruct(a.shape[:-1] + (B,), jnp.int32) for a in arrs]
        out_shapes.append(jax.ShapeDtypeStruct((1, B), jnp.int32))

        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shapes,
            interpret=interpret,
        )(*arrs)
        eps = jnp.sum(outs[-1])
        return from_minor(outs[:-1], state), eps

    return rollout
