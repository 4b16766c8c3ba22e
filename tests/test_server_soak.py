"""Server soak: many rooms across multiple games driven concurrently —
exercises slot allocation/reclamation and the host lock under parallelism."""

import json

import numpy as np
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


def test_sixtyfour_room_burst_exhausts_and_reclaims_slots():
    """80 rooms of one game against a 64-slot pool: the 65th+ allocations
    must reclaim finished rooms (server/manager.py pool-exhaustion path)
    instead of failing. Native backend (the serving default) so the burst
    stays fast; gift-circle finishes in a handful of continue bursts."""
    srv = make_server(port=0, backend="native")
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        n, workers = 80, 8
        results = [None] * n
        lock = threading.Lock()
        nxt = iter(range(n))

        def worker():
            while True:
                with lock:
                    i = next(nxt, None)
                if i is None:
                    return
                _play_one(srv, "gift-circle", i, results, i)

        threads = [threading.Thread(target=worker) for _ in range(workers)]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=600)
        errors = [r for r in results if r and r[0] == "error"]
        assert not errors, errors[:3]
        unfinished = [i for i, r in enumerate(results) if r is None or not r[1]]
        assert not unfinished, unfinished
        assert len({r[3] for r in results}) == n  # 80 distinct rooms served
    finally:
        srv.shutdown()


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


def test_live_rooms_grow_beyond_slot_capacity_native():
    """70 LIVE rooms of one game: the 64-slot warm-start pool must grow
    (server/manager.py _NativeRooms elastic alloc), not 400. Before round
    5 this was a hard cap — the 65th live room raised 'no free game
    slots' (utils/load_test.py stalled at exactly 64 rooms/game)."""
    from game_engine_tpu.server.manager import GameHost

    host = GameHost(backend="native")
    rids = []
    for i in range(70):
        rid = f"grow{i}"
        host.start_room(rid, "werewolf", 6, seed=i)
        rids.append(rid)
    # every room is live and independently steppable past the growth point
    for rid in (rids[0], rids[63], rids[64], rids[69]):
        snap = host.run_until_input_needed(rid)
        assert snap["stateVersion"] >= 1
    assert len({r for r in rids if host.has_room(r)}) == 70
    for rid in rids:
        host.end_room(rid)


def test_gameslots_growth_preserves_state_jax():
    """_GameSlots doubling concat must not disturb in-flight rooms: step a
    room, grow the batch, and require the room's arrays bit-identical and
    still steppable (the jax backend's state is ONE batched pytree)."""
    import jax

    from game_engine_tpu.gamespec.compile import compile_game
    from game_engine_tpu.gamespec.parser import load_builtin
    from game_engine_tpu.gamespec.tables import lower
    from game_engine_tpu.server.manager import _GameSlots

    lowered = lower(compile_game(load_builtin("werewolf")))
    gs = _GameSlots(lowered, capacity=2)
    s0 = gs.alloc(6, seed=7)
    s1 = gs.alloc(6, seed=8)
    for _ in range(3):
        gs.step_slot(s0, {})
    before = jax.tree_util.tree_map(lambda a: np.asarray(a[s0]).copy(),
                                    gs.state)
    s2 = gs.alloc(6, seed=9)  # forces _grow: capacity 2 -> 4
    assert gs.capacity == 4 and s2 == 2
    after = jax.tree_util.tree_map(lambda a: np.asarray(a[s0]), gs.state)
    flat_b, _ = jax.tree_util.tree_flatten(before)
    flat_a, _ = jax.tree_util.tree_flatten(after)
    for b, a in zip(flat_b, flat_a):
        np.testing.assert_array_equal(b, a)
    gs.step_slot(s0, {})  # still steppable at the new batch shape
    gs.step_slot(s2, {})
