"""Golden parity: the jitted engine must match the oracle bit-for-bit —
phase ids, completions, winners, and every state bank — across full games
on both shipped DSLs and many seeds (BASELINE.json north star)."""

import jax.numpy as jnp
import numpy as np
import pytest

from game_engine_tpu.core.engine import BatchedEngine, scripted_actions
from game_engine_tpu.core.state import init_state
from game_engine_tpu.gamespec.compile import GameConfig, compile_game
from game_engine_tpu.gamespec.layout import BANK_BOOL, BANK_NUM, BANK_ODICT, BANK_PDICT, BANK_STR
from game_engine_tpu.gamespec.parser import load_builtin
from game_engine_tpu.gamespec.tables import lower
from game_engine_tpu.oracle.interp import OracleRoom
from game_engine_tpu.policies.scripted import oracle_policy


@pytest.fixture(scope="module")
def ww_lowered():
    return lower(compile_game(load_builtin("werewolf")))


@pytest.fixture(scope="module")
def ttal_lowered():
    return lower(compile_game(load_builtin("two-truths-and-a-lie"), GameConfig(rounds_per_player=1)))


@pytest.fixture(scope="module")
def ww_engine(ww_lowered):
    return BatchedEngine(ww_lowered)


@pytest.fixture(scope="module")
def ttal_engine(ttal_lowered):
    return BatchedEngine(ttal_lowered)


def assert_state_matches(lowered, room, state, b, t):
    """Compare oracle room against batch row b of the engine state."""
    game = lowered.game
    layout = game.layout
    n = room.n
    ctx = f"[t={t} seed={room.seed}]"

    eng_phase_dsl = int(lowered.phase_dsl_id[int(state.phase[b])])
    assert eng_phase_dsl == room.phase.dsl_id, f"{ctx} phase {eng_phase_dsl} != {room.phase.dsl_id}"
    assert bool(state.done[b]) == room.done, f"{ctx} done"
    assert int(state.winner[b]) == room.winner, f"{ctx} winner"
    prev_eng = int(state.prev_phase[b])
    prev_dsl = int(lowered.phase_dsl_id[prev_eng]) if prev_eng >= 0 else None
    assert prev_dsl == room.prev_phase_id, f"{ctx} prev phase"

    bools = np.asarray(state.bools[b])
    nums = np.asarray(state.nums[b])
    strs = np.asarray(state.strs[b])
    pdict = np.asarray(state.pdict[b])
    odict = np.asarray(state.odict[b])
    acted = np.asarray(state.acted[b])

    for p in range(n):
        row = room.players[p + 1]
        assert bool(acted[p]) == ((p + 1) in room.acted), f"{ctx} acted p{p+1}"
        for f in game.spec.declaration.fields:
            slot = layout.slot(f.name)
            ov = row.get(f.name)
            if slot.bank == BANK_BOOL:
                assert bool(bools[p, slot.index]) == bool(ov), f"{ctx} p{p+1}.{f.name}"
            elif slot.bank == BANK_NUM:
                assert int(nums[p, slot.index]) == int(ov or 0), f"{ctx} p{p+1}.{f.name}"
            elif slot.bank == BANK_STR:
                if f.name == "name":
                    continue  # cosmetic
                assert int(strs[p, slot.index]) == slot.encode(ov), (
                    f"{ctx} p{p+1}.{f.name}: engine={int(strs[p, slot.index])} "
                    f"oracle={ov!r}->{slot.encode(ov)}"
                )
            elif slot.bank == BANK_PDICT:
                od = ov or {}
                for q in range(n):
                    want = slot.encode(od.get(str(q + 1), ""))
                    got = int(pdict[p, slot.index, q])
                    assert got == want, f"{ctx} p{p+1}.{f.name}[{q+1}]: {got} != {want}"
            elif slot.bank == BANK_ODICT:
                assert (int(odict[p, slot.index]) != 0) == bool(ov), f"{ctx} p{p+1}.{f.name}"


def run_parity(lowered, eng, n_players, seed, max_steps=300):
    game = lowered.game
    room = OracleRoom(game, n_players=n_players, seed=seed)
    state = init_state(lowered, 1, n_players, np.uint32(seed))
    assert_state_matches(lowered, room, state, 0, -1)
    for t in range(max_steps):
        oa = oracle_policy(room, t, seed)
        ea = scripted_actions(lowered, state)
        # the policies themselves must agree on emitted choices for targeted
        # players (engine emits for everyone; acceptance filters the rest)
        for pid, cv in oa.items():
            assert int(ea[0, pid - 1]) == cv, f"policy mismatch t={t} p{pid}"
        room.step(oa)
        state = eng.step(state, ea)
        assert_state_matches(lowered, room, state, 0, t)
        if room.done:
            break
    assert room.done, f"seed {seed}: game did not finish in {max_steps} steps"


@pytest.mark.parametrize("seed", range(6))
def test_werewolf_parity(ww_lowered, ww_engine, seed):
    run_parity(ww_lowered, ww_engine, n_players=4 + (seed % 4), seed=seed)


@pytest.mark.parametrize("seed", range(6))
def test_twotruths_parity(ttal_lowered, ttal_engine, seed):
    run_parity(ttal_lowered, ttal_engine, n_players=3 + (seed % 3), seed=seed + 100)


def test_batched_rooms_are_independent(ww_lowered, ww_engine):
    """A batch of rooms must evolve exactly as the same rooms run solo."""
    seeds = np.arange(8, dtype=np.uint32)
    n = 5
    eng = ww_engine
    batch_state = init_state(ww_lowered, 8, n, seeds)
    rooms = [OracleRoom(ww_lowered.game, n_players=n, seed=int(s)) for s in seeds]
    for t in range(150):
        acts = scripted_actions(ww_lowered, batch_state)
        for b, room in enumerate(rooms):
            room.step(oracle_policy(room, t, int(seeds[b])))
        batch_state = eng.step(batch_state, acts)
        for b, room in enumerate(rooms):
            assert_state_matches(ww_lowered, room, batch_state, b, t)
        if all(r.done for r in rooms):
            break
    assert all(r.done for r in rooms)
