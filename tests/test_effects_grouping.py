"""GROUP_STMTS (statement reordering by write-target component) is a pure
emission-order lever: rollouts must be bit-identical with it on or off.

The validity argument (core/effects_exec.grouped_stmt_order): every read in
an effect block comes from the block snapshot (P20), so statements only
interfere through the slots they WRITE; any interleaving preserving the
declared order within each union-find component of write targets is
semantically the identity. These tests pin (a) the order function's
invariants on synthetic rows and (b) end-to-end bit-identity on the catalog
games with the richest multi-statement programs, including storm-forge
(the adversarial ~40-statement program) and masquerade-gala (ST_DEAL).
"""

from __future__ import annotations

import jax
import numpy as np
import pytest

from game_engine_tpu.core import step as S
from game_engine_tpu.core.effects_exec import grouped_stmt_order
from game_engine_tpu.core.engine import compiled_rollout
from game_engine_tpu.core.state import init_state
from game_engine_tpu.gamespec import effects as FX
from game_engine_tpu.gamespec.compile import compile_game
from game_engine_tpu.gamespec.parser import load_builtin
from game_engine_tpu.gamespec.tables import lower


def _row(skind, bank=FX.FXB_NUM, slot=0):
    return (skind, bank, slot, 0, 0, 0)


def test_order_is_permutation_and_groups_slots():
    stmts = [
        _row(FX.ST_SET, FX.FXB_NUM, 0),   # 0: n0
        _row(FX.ST_SET, FX.FXB_BOOL, 2),  # 1: b2
        _row(FX.ST_ADD, FX.FXB_NUM, 0),   # 2: n0 (must stay after 0)
        _row(FX.ST_SET, FX.FXB_STR, 1),   # 3: s1
        _row(FX.ST_SET, FX.FXB_BOOL, 2),  # 4: b2 (must stay after 1)
    ]
    order = grouped_stmt_order(stmts, reveal_bool_slots=(), alive_slot=-1)
    assert sorted(order) == list(range(5))
    # same-slot statements are contiguous and in declared order
    assert order.index(2) == order.index(0) + 1
    assert order.index(4) == order.index(1) + 1
    # groups emitted in first-appearance order: n0 group leads
    assert order[0] == 0


def test_kill_merges_alive_and_reveal_components():
    stmts = [
        _row(FX.ST_SET, FX.FXB_BOOL, 5),  # 0: reveal slot 5
        _row(FX.ST_SET, FX.FXB_NUM, 3),   # 1: n3 (independent)
        _row(FX.ST_KILL),                 # 2: writes alive(1) + reveal(5)
        _row(FX.ST_SET, FX.FXB_BOOL, 1),  # 3: alive slot
    ]
    order = grouped_stmt_order(stmts, reveal_bool_slots=(5,), alive_slot=1)
    assert sorted(order) == list(range(4))
    # 0, 2, 3 share a component through kill: declared order preserved
    pos = {i: order.index(i) for i in range(4)}
    assert pos[0] < pos[2] < pos[3]


def test_merged_cross_program_reveals_are_per_statement():
    """The merged path passes each statement its OWN program's reveal
    slots: two kills from different programs with disjoint reveals must
    not be forced into one component by a shared reveal tuple."""
    stmts = [
        _row(FX.ST_KILL),                 # 0: program A kill -> alive+5
        _row(FX.ST_SET, FX.FXB_NUM, 3),   # 1: independent
        _row(FX.ST_KILL),                 # 2: program B kill -> alive+6
        _row(FX.ST_SET, FX.FXB_BOOL, 6),  # 3: program B reveal slot
    ]
    order = grouped_stmt_order(stmts, [(5,), (), (6,), ()], alive_slot=1)
    # both kills write alive(1): one component {0,2,3} in declared order,
    # emitted first (first appearance); the independent num write is
    # grouped out of it and lands after
    assert order == [0, 2, 3, 1]


def test_over_statements_keep_relative_order():
    stmts = [
        _row(FX.ST_OVER),
        _row(FX.ST_SET, FX.FXB_NUM, 7),
        _row(FX.ST_OVER),
    ]
    order = grouped_stmt_order(stmts, reveal_bool_slots=(), alive_slot=-1)
    assert order.index(0) < order.index(2)


def _final_state(lowered, group: bool, batch=16, steps=96):
    S.GROUP_STMTS = group
    try:
        roll = compiled_rollout(lowered, steps, auto_reset=True)
        st, eps = roll(init_state(lowered, batch, 8,
                                  np.arange(batch, dtype=np.uint32)))
        return jax.tree_util.tree_map(np.asarray, st), int(eps)
    finally:
        S.GROUP_STMTS = False


@pytest.mark.parametrize("game", [
    "werewolf", "storm-forge", "cult-of-the-depths", "masquerade-gala",
    "potlatch",
])
def test_rollout_bit_identical_with_grouping(game):
    lowered = lower(compile_game(load_builtin(game)))
    st_off, eps_off = _final_state(lowered, group=False)
    st_on, eps_on = _final_state(lowered, group=True)
    assert eps_on == eps_off
    flat_off, _ = jax.tree_util.tree_flatten(st_off)
    flat_on, _ = jax.tree_util.tree_flatten(st_on)
    assert len(flat_on) == len(flat_off)
    for a, b in zip(flat_off, flat_on):
        np.testing.assert_array_equal(a, b)
