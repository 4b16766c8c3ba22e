"""Server soak: many rooms across multiple games driven concurrently —
exercises slot allocation/reclamation and the host lock under parallelism."""

import json
import threading
from http.client import HTTPConnection

import pytest

from game_engine_tpu.server.api import make_server
from tests.test_server import req


@pytest.fixture(scope="module")
def server():
    srv = make_server(port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()


def _play_one(server, game, seed, results, idx):
    try:
        code, d = req(server, "POST", "/api/rooms/create",
                      {"gameName": game, "playerName": f"host{idx}"})
        assert code == 200, d
        rid = d["room"]["roomId"]
        req(server, "POST", "/api/rooms/add-bot", {"roomId": rid})
        code, snap = req(server, "POST", f"/api/rooms/{rid}/start", {"seed": seed})
        assert code == 200, snap
        for _ in range(150):
            code, snap = req(server, "POST", f"/api/rooms/{rid}/continue")
            assert code == 200, snap
            if snap["done"]:
                break
            req(server, "POST", f"/api/rooms/{rid}/vote", {"playerId": 1, "option": 1})
        results[idx] = ("done", snap["done"], snap["winner"], rid)
    except Exception as e:  # noqa: BLE001 — surfaced via results
        results[idx] = ("error", repr(e), None, None)


def test_twenty_concurrent_rooms(server):
    games = ["werewolf", "two-truths", "werewolf", "two-truths"]
    n = 20
    results = [None] * n
    threads = [
        threading.Thread(target=_play_one, args=(server, games[i % 4], i, results, i))
        for i in range(n)
    ]
    for t in threads:
        t.start()
    # generous deadline: under a full-suite run the host's cores are
    # contended and 20 concurrent rooms legitimately take minutes
    for t in threads:
        t.join(timeout=900)
    stuck = [i for i, r in enumerate(results) if r is None]
    assert not stuck, f"rooms never finished within deadline: {stuck}"
    errors = [r for r in results if r[0] == "error"]
    assert not errors, errors
    assert all(r[1] for r in results), results  # every game finished
    # distinct rooms, all with a winner
    assert len({r[3] for r in results}) == n
    assert all(r[2] >= 1 for r in results)
