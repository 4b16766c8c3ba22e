"""Rooms beyond the reference's 8-player cap: the engine is generic over
MAX_PLAYERS (the reference hardcodes 8, rooms/create/route.ts:76)."""

import numpy as np
import pytest

from game_engine_tpu.core.engine import BatchedEngine, scripted_actions
from game_engine_tpu.core.state import init_state
from game_engine_tpu.gamespec.compile import GameConfig, compile_game
from game_engine_tpu.gamespec.parser import load_builtin
from game_engine_tpu.gamespec.tables import lower
from game_engine_tpu.oracle.interp import OracleRoom
from game_engine_tpu.policies.scripted import oracle_policy
from tests.test_parity import assert_state_matches


@pytest.mark.parametrize("n_players", [10, 12])
def test_twelve_player_werewolf_parity(n_players):
    lowered = lower(compile_game(load_builtin("werewolf"), GameConfig(max_players=12)))
    assert lowered.P == 12
    seed = n_players
    room = OracleRoom(lowered.game, n_players=n_players, seed=seed)
    eng = BatchedEngine(lowered)
    state = init_state(lowered, 1, n_players, np.uint32(seed))
    for t in range(400):
        room.step(oracle_policy(room, t, seed))
        state = eng.step(state, scripted_actions(lowered, state))
        assert_state_matches(lowered, room, state, 0, t)
        if room.done:
            break
    assert room.done
    roles = room.field_values("role")
    # P10: surplus players become the filler role (Villager)
    assert roles.count("Villager") == n_players - 3
    assert roles.count("Werewolf") == 1


def test_large_room_native_parity():
    from game_engine_tpu.native import available

    if not available():
        pytest.skip("native backend unavailable")
    from tests.test_native import run_differential

    lowered = lower(compile_game(load_builtin("werewolf"), GameConfig(max_players=12)))
    run_differential(lowered, n_players=11, seed=3, max_steps=400)
