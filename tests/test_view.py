"""View layer: decode, projection, audience gating, clearCanvas semantics."""

import numpy as np
import pytest

from game_engine_tpu.core.engine import BatchedEngine, scripted_actions
from game_engine_tpu.core.state import init_state
from game_engine_tpu.gamespec.compile import GameConfig, compile_game
from game_engine_tpu.gamespec.parser import load_builtin
from game_engine_tpu.gamespec.tables import lower
from game_engine_tpu.oracle.interp import OracleRoom
from game_engine_tpu.policies.scripted import oracle_policy
from game_engine_tpu.view.cards import clear_canvas, make_item, visible_to
from game_engine_tpu.view.decode import decode_room
from game_engine_tpu.view.project import Projector


@pytest.fixture(scope="module")
def ww():
    return lower(compile_game(load_builtin("werewolf")))


@pytest.fixture(scope="module")
def ttal():
    return lower(compile_game(load_builtin("two-truths-and-a-lie"), GameConfig()))


def test_audience_gate():
    pub = make_item("1", "text_display", "hi", content="x")
    priv = make_item("2", "voting_panel", "vote", audience_type=False,
                     audience_ids=["2", "3"], votingId="v1", options=["a"])
    assert visible_to(pub, "1") and visible_to(pub, "9")
    assert not visible_to(priv, "1")
    assert visible_to(priv, "2") and visible_to(priv, "3")


def test_clear_canvas_keeps_avatars_and_exempt():
    items = [
        make_item("1", "avatar_set", "Avatars", avatarType="human"),
        make_item("2", "text_display", "x", content="x"),
        make_item("3", "death_marker", "dead", playerName="P2", playerId="2"),
        make_item("4", "timer", "t", duration=10),
    ]
    kept = clear_canvas(items, exempt=["death_marker"])
    assert [i.id for i in kept] == ["1", "3"]
    kept2 = clear_canvas(items)
    assert [i.id for i in kept2] == ["1"]


def test_decode_matches_oracle_snapshot(ww):
    room = OracleRoom(ww.game, n_players=5, seed=3)
    state = init_state(ww, 1, 5, np.uint32(3))
    eng = BatchedEngine(ww)
    for t in range(25):
        room.step(oracle_policy(room, t, 3))
        state = eng.step(state, scripted_actions(ww, state))
    snap_o = room.snapshot()
    snap_e = decode_room(ww, state, 0)
    assert snap_e["current_phase_id"] == snap_o["current_phase_id"]
    for pid, row in snap_o["player_states"].items():
        erow = snap_e["player_states"][pid]
        for k, v in row.items():
            if k == "name":
                continue
            assert erow[k] == v, f"{pid}.{k}: {erow[k]!r} != {v!r}"


def test_projection_phases_werewolf(ww):
    room = OracleRoom(ww.game, n_players=5, seed=0)
    proj = Projector(ww.game)
    prev_dead = []
    snap0 = room.snapshot()
    snap0["stateVersion"] = -1
    snap0["deadPlayers"] = []
    items = proj.project(snap0)  # phase 0: intro + avatar set
    seen_types = {i.type for i in items}
    for t in range(200):
        room.step(oracle_policy(room, t, 0))
        snap = room.snapshot()
        snap["deadPlayers"] = [
            p for p, row in snap["player_states"].items() if not row.get("is_alive", True)
        ]
        snap["stateVersion"] = t
        items = proj.project(snap, prev_items=items, prev_dead=prev_dead)
        prev_dead = snap["deadPlayers"]
        seen_types |= {i.type for i in items}
        # phase indicator present whenever the DSL phase renders one
        phase_tools = {t for a in ww.game.spec.phases[snap["current_phase_id"]].actions for t in a.tools}
        if "createPhaseIndicator" in phase_tools:
            assert any(i.type == "phase_indicator" for i in items)
        # voting panels only visible to the target group
        if snap["current_phase_id"] in (2, 10):  # werewolf night choice
            vp = [i for i in items if i.type == "voting_panel"]
            assert vp, "werewolf phase must render a voting panel"
            wolves = [p for p, r in snap["player_states"].items()
                      if r.get("role") == "Werewolf" and r.get("is_alive")]
            others = [p for p in snap["player_states"] if p not in wolves]
            for w in wolves:
                assert visible_to(vp[0], w)
            for o in others:
                assert not visible_to(vp[0], o)
        if room.done:
            break
    assert room.done
    assert {"phase_indicator", "text_display", "voting_panel", "result_display",
            "avatar_set", "character_card", "timer"} <= seen_types
    # death markers persist across clears once someone died
    dead = [p for p, r in room.players.items() if not r["is_alive"]]
    if dead:
        assert any(i.type == "death_marker" for i in items)
    # final phase shows the winner
    rd = [i for i in items if i.type == "result_display"]
    assert rd and "winner" in rd[-1].data["content"]


def test_projection_twotruths_statements(ttal):
    room = OracleRoom(ttal.game, n_players=3, seed=0)
    proj = Projector(ttal.game)
    items, prev_dead = [], []
    seen_types = set()
    for t in range(120):
        room.step(oracle_policy(room, t, 0))
        snap = room.snapshot()
        snap["stateVersion"] = t
        items = proj.project(snap, prev_items=items, prev_dead=prev_dead)
        seen_types |= {i.type for i in items}
        if snap["current_phase_id"] == 2:
            # speaker-only text input
            bi = [i for i in items if i.type == "broadcast_input"]
            assert bi and not bi[0].data["audience_type"]
        if room.done:
            break
    assert {"score_board", "statement_board", "turn_indicator"} <= seen_types


def test_singletons_do_not_duplicate_on_reprojection(ttal):
    """Polling GET /state re-projects; avatar sets / scoreboards must not
    stack duplicates (review finding)."""
    room = OracleRoom(ttal.game, n_players=3, seed=0)
    proj = Projector(ttal.game)
    snap = room.snapshot()
    snap["stateVersion"] = 0
    items = proj.project(snap)  # phase 0: avatar set + scoreboard created
    for _ in range(5):
        items = proj.project(snap, prev_items=items)
    assert sum(1 for i in items if i.type == "avatar_set") == 1
    assert sum(1 for i in items if i.type == "score_board") == 1


def test_scoreboard_persists_through_exempting_clears(ttal):
    """'Clear previous UI, exempt persistent scoreboard' must keep the
    scoreboard across round phases (review finding)."""
    room = OracleRoom(ttal.game, n_players=3, seed=0)
    proj = Projector(ttal.game)
    snap = room.snapshot()
    snap["stateVersion"] = -1
    items = proj.project(snap)
    assert any(i.type == "score_board" for i in items)
    for t in range(6):  # through Round Start / Collection / Selection ...
        room.step(oracle_policy(room, t, 0))
        snap = room.snapshot()
        snap["stateVersion"] = t
        items = proj.project(snap, prev_items=items)
        assert any(i.type == "score_board" for i in items), (
            f"scoreboard wiped at phase {snap['current_phase_id']}"
        )


def test_item_ids_unique_and_numeric(ww):
    room = OracleRoom(ww.game, n_players=4, seed=1)
    proj = Projector(ww.game)
    items = []
    for t in range(30):
        room.step(oracle_policy(room, t, 1))
        snap = room.snapshot()
        snap["stateVersion"] = t
        items = proj.project(snap, prev_items=items)
        ids = [i.id for i in items]
        assert len(ids) == len(set(ids))
        assert all(i.isdigit() and len(i) == 4 for i in ids)
