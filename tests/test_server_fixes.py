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
