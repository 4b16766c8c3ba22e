"""Independent chat probe set (VERDICT r4 item 5).

The frozen fixture (tests/fixtures/chat_probes.json) is scored by
host-verifiable checks against live room state — composer-independent,
unlike the EM corpora. Pinned here:

  * the composer tier passes every probe (grounded values, refusals
    without leaks, casualty recaps) — floor measured in round 5;
  * history_reply_ok: the round-5 verifier the probe eval motivated —
    garbled roster names and wrong casualty facts in a learned history
    decode are rejected so commit_reply falls back to the truthful
    template (the same correctness-over-roleplay rule as grounded_reply_ok).

The LM-tier comparison (raw ceiling vs product path) runs via
`python -m game_engine_tpu.utils.eval_chat_probes` into
docs/chat_probe_eval_r5.json — too slow for the suite.
"""

import json

import pytest

from game_engine_tpu.server.chat import history_reply_ok
from game_engine_tpu.utils.eval_chat_probes import (FIXTURE,
                                                    build_room_snapshot,
                                                    run_probe)


@pytest.fixture(scope="module")
def data():
    with open(FIXTURE) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def rooms(data):
    return {r["game"]: build_room_snapshot(
        r["game"], r["n_players"], r["seed"], r["steps"])
        for r in data["rooms"]}


def test_probe_rooms_are_midgame(rooms):
    """A probe against a finished room measures nothing."""
    for game, (snap, _vis, _spec, room) in rooms.items():
        assert not room.done, f"{game} room is over at probe time"


def test_composer_passes_every_probe(data, rooms):
    failures = []
    for probe in data["probes"]:
        r = run_probe(probe, rooms, lm_hook=None)
        if not r["ok"]:
            failures.append((r["id"], r.get("reply")))
    assert not failures, failures


def test_history_verifier_rejects_garbled_names():
    h = {"dead": ["Marisol"], "roster": ["Marisol", "Boro", "Ciri"]}
    assert not history_reply_ok(
        "The short of it: Playerer3, Player7 fallen.", h)


def test_history_verifier_rejects_nothing_happened_over_corpses():
    h = {"dead": ["Marisol"], "roster": ["Marisol", "Boro"]}
    assert not history_reply_ok(
        "Nothing to recap yet - everyone's standing.", h)


def test_history_verifier_rejects_misreported_living():
    h = {"dead": ["Marisol"], "roster": ["Marisol", "Boro"]}
    assert not history_reply_ok("So far we've lost Marisol and Boro.", h)


def test_history_verifier_accepts_faithful_recap():
    h = {"dead": ["Marisol"], "roster": ["Marisol", "Boro", "Ciri"]}
    assert history_reply_ok(
        "The short of it: Marisol fallen, 2 of us left.", h)
    assert history_reply_ok("So far we've lost Marisol.", h)


def test_history_verifier_accepts_quiet_board():
    h = {"dead": [], "roster": ["Boro", "Ciri"]}
    assert history_reply_ok("Nothing to recap yet - all quiet.", h)
