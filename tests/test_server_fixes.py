"""Regression tests for the round-4 server review fixes: journal
torn-tail repair on reattach, projection caching for named reads (stable
item ids across polls), RoomGone on the post_chat teardown race, and
exact-name game resolution beating substring matches."""

import json
import os
import shutil

import pytest
import yaml

from game_engine_tpu.gamespec.parser import games_dir
from game_engine_tpu.server.journal import RoomJournal
from game_engine_tpu.server.manager import GameHost, RoomGone


def test_journal_torn_tail_repaired_on_reattach(tmp_path):
    """Crash mid-append leaves a partial line; a reattached journal must
    truncate it, not merge the next event into it (a merged line makes a
    SECOND restore drop every later event)."""
    path = str(tmp_path / "room.jsonl")
    j = RoomJournal(path)
    j.create({"game": "werewolf", "n": 5})
    j.append({"k": "step", "t": 1})
    j.append({"k": "step", "t": 2})
    # simulate the torn tail: a partial event with no newline
    with open(path, "a", encoding="utf-8") as f:
        f.write('{"k": "st')
    # reattach (the restore path constructs a fresh RoomJournal) + append
    j2 = RoomJournal(path)
    j2.append({"k": "step", "t": 3})
    header, events = RoomJournal.load(path)
    assert header["game"] == "werewolf"
    assert [e["t"] for e in events] == [1, 2, 3], events
    # every line on disk parses (no merged fragment)
    with open(path, encoding="utf-8") as f:
        for line in f:
            json.loads(line)


def _gdir(tmp_path, *files):
    gdir = tmp_path / "games"
    gdir.mkdir(exist_ok=True)
    for fn in files:
        shutil.copy(os.path.join(games_dir(), fn), gdir / fn)
    return str(gdir)


def test_projection_cached_for_named_reads(tmp_path):
    """API reads always pass the room's name map; the projection cache
    must still hit so repeated polls at one engine version neither churn
    item ids nor re-run the projector (duplicate-item accumulation)."""
    gdir = _gdir(tmp_path, "tide-pool.yaml")
    host = GameHost(games_path=gdir, backend="native")
    host.start_room("r", "tide-pool", 4, seed=5, human_seats=[4])
    host.run_until_input_needed("r", max_steps=8)
    names = {1: "A", 2: "B", 3: "C", 4: "D"}
    a = host.snapshot("r", names)
    items_a = [(i["id"], i["type"]) for i in a["items"]]
    for _ in range(5):
        b = host.snapshot("r", names)
    items_b = [(i["id"], i["type"]) for i in b["items"]]
    assert items_a == items_b, "item ids churned across same-version polls"
    assert a["stateVersion"] == b["stateVersion"]


def test_post_chat_after_end_room_raises_room_gone(tmp_path):
    gdir = _gdir(tmp_path, "tide-pool.yaml")
    host = GameHost(games_path=gdir, backend="native")
    host.start_room("r", "tide-pool", 4, seed=1, human_seats=[1])
    host.end_room("r")
    with pytest.raises(RoomGone):
        host.post_chat("r", 1, "hello?", {1: "A"})


def test_exact_game_name_beats_substring(tmp_path):
    """Game names come from filenames; a decoy sorting earlier whose name
    CONTAINS the requested name must not shadow the exact match."""
    gdir = _gdir(tmp_path, "auction-house.yaml")
    doc = yaml.safe_load(open(os.path.join(games_dir(), "auction-house.yaml")))
    doc["declaration"]["description"] = "A grander auction."
    # 'a-grand-auction-house-hall' sorts before 'auction-house' and
    # contains it as a substring — the old first-containment-wins loop
    # bound the room to this decoy
    with open(os.path.join(gdir, "a-grand-auction-house-hall.yaml"), "w") as f:
        yaml.safe_dump(doc, f, sort_keys=False)
    from game_engine_tpu.gamespec.parser import load_game_spec

    n_decoy = load_game_spec(
        os.path.join(gdir, "a-grand-auction-house-hall.yaml")).name
    n_exact = load_game_spec(os.path.join(gdir, "auction-house.yaml")).name
    assert n_exact in n_decoy and n_decoy != n_exact
    host = GameHost(games_path=gdir, backend="native")
    slots = host._game_slots(n_exact)
    assert slots.lowered.game.spec.name == n_exact
    # the fuzzy fallback still works when nothing matches exactly
    host2 = GameHost(games_path=gdir, backend="native")
    slots2 = host2._game_slots("grand-auction")
    assert slots2.lowered.game.spec.name == n_decoy


# -- view-layer review fixes -------------------------------------------------


def test_role_card_tool_renders_character_cards(tmp_path):
    """createRoleCard (used by midnight-circle/cult/shadow-fold) maps to
    the character_card renderer; it used to be missing from TOOL_TO_CARD,
    so hidden-role games never showed anyone their role."""
    from game_engine_tpu.view.cards import TOOL_TO_CARD

    assert TOOL_TO_CARD["createRoleCard"] == "character_card"
    gdir = _gdir(tmp_path, "midnight-circle.yaml")
    host = GameHost(games_path=gdir, backend="native")
    host.start_room("r", "midnight-circle", 5, seed=3, human_seats=[1])
    snap = host.run_until_input_needed("r", max_steps=12)
    cards = [i for i in snap["items"] if i["type"] == "character_card"]
    assert cards, "no character cards rendered after role assignment"
    # private: each card visible to exactly one seat
    for c in cards:
        d = c.get("data") or {}
        assert d.get("audience_type") is False
        assert len(d.get("audience_ids") or []) == 1


def test_scoreboard_uses_game_over_score_field():
    """tide-pool scores by 'pearls' (GameOver.score_field); the old
    hardcoded candidate list rendered an empty board for 13 games."""
    from game_engine_tpu.gamespec.compile import compile_game
    from game_engine_tpu.gamespec.parser import load_builtin
    from game_engine_tpu.view.project import Projector

    game = compile_game(load_builtin("tide-pool"))
    proj = Projector(game)
    assert proj._score_field() == "pearls"
    snap = {
        "current_phase_id": 2,  # Tide Resolution lists createScoreBoard
        "done": False, "winner": 0, "deadPlayers": [],
        "player_states": {
            "1": {"name": "A", "pearls": 4, "stash": 0, "dive_pick": 0,
                  "rounds": 1},
            "2": {"name": "B", "pearls": 2, "stash": 1, "dive_pick": 0,
                  "rounds": 1},
        },
    }
    items = proj.project(snap)
    boards = [i for i in items if i.type == "score_board"]
    assert boards, "no scoreboard rendered in the resolution phase"
    entries = boards[-1].data.get("entries")
    assert entries and {e["name"]: e["score"] for e in entries} ==         {"A": 4, "B": 2}


def test_multi_terminal_winner_text_uses_ending_terminal(tmp_path):
    """gold-rush has a score terminal (98) and a team terminal (99); a
    team win must display the team name, not the score branch's player
    name from whichever terminal sorts first."""
    from game_engine_tpu.gamespec.compile import compile_game
    from game_engine_tpu.gamespec.parser import load_builtin
    from game_engine_tpu.gamespec.tables import lower
    from game_engine_tpu.view.project import Projector

    game = compile_game(load_builtin("gold-rush"))
    proj = Projector(game)
    team_terms = [
        (p, m) for p in game.phases if p.terminal
        for m in p.program.on_enter
        if getattr(m, "mode", None) == "team"
    ]
    assert team_terms, "gold-rush lost its team terminal?"
    phase, mech = team_terms[0]
    snap = {"current_phase_id": phase.dsl_id, "done": True, "winner": 1,
            "player_states": {"1": {"name": "Alice"}}}
    txt = proj._winner_text(1, snap)
    assert txt == mech.team_order[0], (txt, mech.team_order)


def test_tier3_empty_targets_stay_private():
    from game_engine_tpu.view.project import _audience

    aud_type, ids = _audience(3, "TIER 3 - PRIVATE: your role", [], ["1", "2"])
    assert aud_type is False and ids == [], "empty tier-3 audience broadcast"
    aud_type, ids = _audience(3, "TIER 3", ["2"], ["1", "2"])
    assert ids == ["2"]


def test_serving_path_validates_games(tmp_path):
    """Hand-dropped YAML with validator ERRORS (here: an unreachable
    terminal) must fail room creation loudly instead of playing with
    silent no-op phases — the serving path never runs /api/generate-dsl's
    validation."""
    gdir = _gdir(tmp_path, "tide-pool.yaml")
    doc = yaml.safe_load(open(os.path.join(gdir, "tide-pool.yaml")))
    # break the graph: the resolution phase loops to itself only, so no
    # terminal is reachable
    doc["phases"][2]["next_phase"] = {"Otherwise the diving continues":
                                      {"id": 1, "name": "Depth Choice"}}
    with open(os.path.join(gdir, "broken.yaml"), "w") as f:
        yaml.safe_dump(doc, f, sort_keys=False)
    host = GameHost(games_path=gdir, backend="native")
    with pytest.raises(ValueError, match="failed validation"):
        host.start_room("r", "broken", 4, seed=1, human_seats=[1])
    # the intact copy still starts
    host.start_room("ok", "tide-pool", 4, seed=1, human_seats=[1])
