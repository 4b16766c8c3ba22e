"""End-to-end host-service test: lobby REST flow + a full interactive
werewolf game driven over HTTP (reference flow: SURVEY.md §3.1-3.3)."""

import json
import threading
import time
from http.client import HTTPConnection

import pytest

from game_engine_tpu.server.api import make_server


@pytest.fixture(scope="module")
def server():
    srv = make_server(port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()


def req(server, method, path, body=None, retries=4):
    """One HTTP request with bounded retry on connection-level failures.

    Under full-suite CPU contention the accept loop can still be starved
    long enough for a fresh connection to be reset; a short backoff retry
    makes the client robust without masking real server errors (HTTP error
    codes are returned, never retried)."""
    payload = json.dumps(body) if body is not None else None
    delay = 0.05
    for attempt in range(retries + 1):
        try:
            conn = HTTPConnection("127.0.0.1", server.server_address[1],
                                  timeout=60)
            conn.request(method, path, body=payload,
                         headers={"Content-Type": "application/json"})
            resp = conn.getresponse()
            data = json.loads(resp.read())
            conn.close()
            return resp.status, data
        except (ConnectionError, TimeoutError):
            if attempt == retries:
                raise
            time.sleep(delay)
            delay = min(delay * 2, 1.0)


def test_game_catalog(server):
    code, data = req(server, "GET", "/api/games")
    assert code == 200
    names = [g["name"] for g in data["games"]]
    assert any("werewolf" in n for n in names)
    assert any("two-truths" in n for n in names)


def test_full_lobby_and_game_flow(server):
    # create room (host = player 1, the human)
    code, data = req(server, "POST", "/api/rooms/create",
                     {"gameName": "werewolf", "playerName": "Alice"})
    assert code == 200, data
    room_id = data["room"]["roomId"]
    assert data["player"]["id"] == 1 and data["player"]["isHost"]

    # join a second human, then fill with bots to min_players
    code, data = req(server, "POST", "/api/rooms/join",
                     {"roomId": room_id, "playerName": "Bob"})
    assert code == 200 and data["player"]["id"] == 2
    code, data = req(server, "POST", "/api/rooms/add-bot", {"roomId": room_id})
    assert code == 200 and data["playerCount"] == 4

    # duplicate name rejected
    code, _ = req(server, "POST", "/api/rooms/join",
                  {"roomId": room_id, "playerName": "Bob"})
    assert code == 400

    # room listing shows it as joinable
    code, data = req(server, "GET", "/api/rooms/list?game=werewolf-(mafia)")
    assert code == 200 and any(r["roomId"] == room_id for r in data["rooms"])

    # start: players initialized from the template, engine slot allocated
    code, snap = req(server, "POST", f"/api/rooms/{room_id}/start", {"seed": 7})
    assert code == 200, snap
    assert snap["current_phase_id"] == 0
    assert len(snap["player_states"]) == 4
    assert snap["player_states"]["1"]["name"] == "Alice"
    assert snap["player_states"]["2"]["name"] == "Bob"

    # started rooms disappear from the joinable list
    code, data = req(server, "GET", "/api/rooms/list?game=werewolf-(mafia)")
    assert not any(r["roomId"] == room_id for r in data["rooms"])

    # drive the game: continue until a human must act, then act, repeat.
    # Alice (seat 1) and Bob (seat 2) are both human seats — multi-human
    # rooms are first-class (the reference admits broadcasting is missing,
    # /root/reference/README.md:22); waiting_on lists who must act.
    assert snap["human_seats"] == [1, 2]
    for _ in range(80):
        code, snap = req(server, "POST", f"/api/rooms/{room_id}/continue")
        assert code == 200, snap
        assert snap.get("truncated") is False
        if snap["done"]:
            break
        assert snap["waiting_on"], "continue stopped without a human to act"
        for pid in snap["waiting_on"]:
            code, _ = req(server, "POST", f"/api/rooms/{room_id}/vote",
                          {"playerId": pid, "option": 1})
            assert code == 200
    assert snap["done"], f"game did not finish: stuck at phase {snap['current_phase_id']}"
    assert snap["winner"] in (1, 2)

    # per-viewer visibility: the human's view hides other players' role cards
    code, view1 = req(server, "GET", f"/api/rooms/{room_id}/state?playerId=1")
    assert code == 200
    for item in view1["items"]:
        assert item["data"]["audience_type"] or "1" in item["data"]["audience_ids"]

    # phase_history accumulated {phase_id, phase_name, timestamp} entries
    hist = view1["phase_history"]
    assert hist[-1]["phase_id"] == 99
    assert all("phase_name" in h and "timestamp" in h for h in hist)


def test_native_backend_full_game():
    """Same interactive flow on the C++ backend (skipped without g++)."""
    from game_engine_tpu.native import available

    if not available():
        pytest.skip("native backend unavailable")
    srv = make_server(port=0, backend="native")
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        code, data = req(srv, "POST", "/api/rooms/create",
                         {"gameName": "two-truths", "playerName": "Nat"})
        assert code == 200, data
        room_id = data["room"]["roomId"]
        code, data = req(srv, "POST", "/api/rooms/add-bot", {"roomId": room_id})
        assert code == 200
        code, snap = req(srv, "POST", f"/api/rooms/{room_id}/start", {"seed": 3})
        assert code == 200, snap
        for _ in range(120):
            code, snap = req(srv, "POST", f"/api/rooms/{room_id}/continue")
            assert code == 200, snap
            if snap["done"]:
                break
            req(srv, "POST", f"/api/rooms/{room_id}/vote", {"playerId": 1, "option": 1})
        assert snap["done"]
        assert snap["winner"] >= 1
    finally:
        srv.shutdown()


def test_overflow_action_is_ignored(server):
    """An out-of-int32 choice must not crash the step (review finding)."""
    code, d = req(server, "POST", "/api/rooms/create",
                  {"gameName": "werewolf", "playerName": "Ovf"})
    room_id = d["room"]["roomId"]
    req(server, "POST", "/api/rooms/add-bot", {"roomId": room_id})
    req(server, "POST", f"/api/rooms/{room_id}/start", {"seed": 1})
    code, _ = req(server, "POST", f"/api/rooms/{room_id}/action",
                  {"playerId": 1, "choice": 2**40})
    assert code == 200
    code, snap = req(server, "POST", f"/api/rooms/{room_id}/step")
    assert code == 200 and snap["current_phase_id"] == 1  # advanced normally


def test_double_start_rejected_and_close_frees_slot(server):
    code, d = req(server, "POST", "/api/rooms/create",
                  {"gameName": "werewolf", "playerName": "Dbl"})
    room_id = d["room"]["roomId"]
    req(server, "POST", "/api/rooms/add-bot", {"roomId": room_id})
    code, _ = req(server, "POST", f"/api/rooms/{room_id}/start", {"seed": 1})
    assert code == 200
    code, data = req(server, "POST", f"/api/rooms/{room_id}/start", {"seed": 2})
    assert code == 409, data  # re-start must not reset the game / leak a slot
    code, data = req(server, "POST", f"/api/rooms/{room_id}/close")
    assert code == 200 and data["closed"]
    code, _ = req(server, "POST", f"/api/rooms/{room_id}/step")
    assert code == 409  # closed rooms are finished


def test_room_errors(server):
    code, _ = req(server, "GET", "/api/rooms/nonexistent")
    assert code == 404
    code, _ = req(server, "POST", "/api/rooms/create", {"gameName": "no-such-game"})
    assert code == 404
    code, _ = req(server, "POST", "/api/rooms/nonexistent/step")
    assert code == 404
    code, data = req(server, "DELETE", "/api/rooms/nonexistent")
    assert code == 405 and "error" in data


def test_viewer_state_masks_hidden_roles(server):
    """GET state hides other players' private fields (roles, night flags)."""
    code, d = req(server, "POST", "/api/rooms/create",
                  {"gameName": "werewolf", "playerName": "Maskie"})
    room_id = d["room"]["roomId"]
    req(server, "POST", "/api/rooms/add-bot", {"roomId": room_id})
    code, snap = req(server, "POST", f"/api/rooms/{room_id}/start", {"seed": 2})
    code, snap = req(server, "POST", f"/api/rooms/{room_id}/step")  # roles assigned
    assert snap["current_phase_id"] == 1
    true_roles = {p: r["role"] for p, r in snap["player_states"].items()}

    code, view = req(server, "GET", f"/api/rooms/{room_id}/state?playerId=1")
    ps = view["player_states"]
    assert ps["1"]["role"] == true_roles["1"]  # own role visible
    my_team = snap["player_states"]["1"]["team"]
    for pid, row in ps.items():
        if pid == "1":
            continue
        if snap["player_states"][pid]["team"] == my_team and my_team == "werewolves":
            assert row["role"] == true_roles[pid]  # teammates see each other
        else:
            assert row["role"] is None, f"role of p{pid} leaked to viewer 1"
            assert row["team"] is None


def test_crash_resume_restores_room_bit_identically(tmp_path):
    """Kill the server mid-game (drop the process state), restart on the
    same storage, and the room resumes bit-identically from its journal
    (VERDICT r1 item 5; reference analogue: LangGraph thread persistence +
    temp-rooms.json reload-on-read, src/lib/storage/memory.ts:48-127)."""
    from game_engine_tpu.server.api import AppContext

    sp = str(tmp_path / "rooms.json")
    ctx = AppContext(sp)
    _, d = ctx.handle("POST", "/api/rooms/create", {},
                      {"gameName": "werewolf", "playerName": "Alice"})
    rid = d["room"]["roomId"]
    ctx.handle("POST", "/api/rooms/add-bot", {}, {"roomId": rid})
    _, snap = ctx.handle("POST", f"/api/rooms/{rid}/start", {}, {"seed": 11})
    for _ in range(2):
        _, snap = ctx.handle("POST", f"/api/rooms/{rid}/continue", {}, {})
        assert not snap["done"]
        for pid in snap["waiting_on"]:
            ctx.handle("POST", f"/api/rooms/{rid}/vote", {},
                       {"playerId": pid, "option": 2})
    ctx.handle("POST", f"/api/rooms/{rid}/chat", {},
               {"playerId": 1, "message": "who do you suspect?"})
    ref = ctx.host.snapshot(rid)
    _, ref_chat = ctx.handle("GET", f"/api/rooms/{rid}/chat", {"playerId": ["1"]}, {})
    del ctx  # kill -9: all in-memory state gone

    ctx2 = AppContext(sp)  # restart replays the journal
    code, _ = ctx2.handle("GET", f"/api/rooms/{rid}/state", {"playerId": ["1"]}, {})
    assert code == 200
    snap2 = ctx2.host.snapshot(rid)
    assert snap2["stateVersion"] == ref["stateVersion"]
    assert snap2["current_phase_id"] == ref["current_phase_id"]
    assert snap2["player_states"] == ref["player_states"]
    assert snap2["phase_history"] == ref["phase_history"]
    _, chat2 = ctx2.handle("GET", f"/api/rooms/{rid}/chat", {"playerId": ["1"]}, {})
    assert [m["message"] for m in chat2["messages"]] == \
        [m["message"] for m in ref_chat["messages"]]
    # journal events carry wall clocks: restored chat keeps its timestamps
    assert [m["timestamp"] for m in chat2["messages"]] == \
        [m["timestamp"] for m in ref_chat["messages"]]
    # the restored room plays on to completion
    for _ in range(200):
        code, snap = ctx2.handle("POST", f"/api/rooms/{rid}/continue", {}, {})
        assert code == 200, snap
        if snap["done"]:
            break
        for pid in snap["waiting_on"]:
            ctx2.handle("POST", f"/api/rooms/{rid}/vote", {},
                        {"playerId": pid, "option": 1})
    assert snap["done"]


def test_orphaned_playing_room_marked_finished(tmp_path):
    """A 'playing' room whose journal is gone gets a clear 410, not a
    KeyError-shaped 400 (ADVICE r1 manager.py:210)."""
    import os

    from game_engine_tpu.server.api import AppContext

    sp = str(tmp_path / "rooms.json")
    ctx = AppContext(sp)
    _, d = ctx.handle("POST", "/api/rooms/create", {},
                      {"gameName": "two-truths", "playerName": "Orp"})
    rid = d["room"]["roomId"]
    ctx.handle("POST", "/api/rooms/add-bot", {}, {"roomId": rid})
    _, _ = ctx.handle("POST", f"/api/rooms/{rid}/start", {}, {"seed": 1})
    os.remove(sp + ".rooms/" + rid + ".jsonl")
    del ctx

    ctx2 = AppContext(sp)
    code, data = ctx2.handle("POST", f"/api/rooms/{rid}/step", {}, {})
    assert code in (409, 410), data
    assert "error" in data
    _, room = ctx2.handle("GET", f"/api/rooms/{rid}", {}, {})
    assert room["room"]["status"] == "finished"


def test_free_text_statements_surface_in_state(server):
    """Two-truths: real submitted statements appear in player_states and on
    the statement board; bots get deterministic stand-ins (VERDICT r1
    item 2; reference: games/two-truths-and-a-lie.yaml statements dict)."""
    code, d = req(server, "POST", "/api/rooms/create",
                  {"gameName": "two-truths", "playerName": "Stmt"})
    room_id = d["room"]["roomId"]
    req(server, "POST", "/api/rooms/add-bot", {"roomId": room_id})
    code, snap = req(server, "POST", f"/api/rooms/{room_id}/start", {"seed": 5})
    assert code == 200, snap
    my_statements = ["I own a boat", "I hate pizza", "I ran a marathon"]
    seen_mine = seen_bot = False
    for _ in range(80):
        code, snap = req(server, "POST", f"/api/rooms/{room_id}/continue")
        assert code == 200, snap
        if snap["done"]:
            break
        for pid in snap["waiting_on"]:
            # submit with free text; non-submit phases ignore the text
            code, _ = req(server, "POST", f"/api/rooms/{room_id}/action",
                          {"playerId": pid, "choice": 1,
                           "text": "\n".join(my_statements)})
            assert code == 200
        for p, row in snap["player_states"].items():
            stmts = row.get("statements") or {}
            if not stmts:
                continue
            assert stmts != {"1": "submitted"}, "marker leaked to the client"
            if p == "1" and list(stmts.values()) == my_statements:
                seen_mine = True
            if p != "1" and len(stmts) == 3:
                seen_bot = True
                # statement board shows the real text
                boards = [i for i in snap["items"] if i["type"] == "statement_board"]
                if boards and boards[-1]["data"].get("statements"):
                    assert boards[-1]["data"]["statements"][0] in (
                        list(stmts.values()) + my_statements
                    )
    assert snap["done"]
    assert seen_mine, "human statements never surfaced"
    assert seen_bot, "bot statements never synthesized"


def test_two_games_hosted_concurrently(server):
    """Two different game DSLs live side-by-side in the same host."""
    rooms = {}
    for game, n_req in (("werewolf", None), ("two-truths", None)):
        code, data = req(server, "POST", "/api/rooms/create",
                         {"gameName": game, "playerName": f"host-{game}"})
        assert code == 200, data
        rid = data["room"]["roomId"]
        req(server, "POST", "/api/rooms/add-bot", {"roomId": rid})
        code, snap = req(server, "POST", f"/api/rooms/{rid}/start", {"seed": 1})
        assert code == 200, snap
        rooms[game] = rid
    # stepping one room must not advance the other
    code, s1 = req(server, "POST", f"/api/rooms/{rooms['werewolf']}/step")
    code, s2 = req(server, "GET", f"/api/rooms/{rooms['two-truths']}/state?playerId=1")
    assert s1["current_phase_id"] == 1  # werewolf advanced 0 -> 1
    assert s2["current_phase_id"] == 0  # two-truths untouched
    assert s2["gameName"].startswith("two-truths")


def test_corrupt_journal_event_fails_restore_cleanly(tmp_path):
    """A corrupt mid-journal event must not leave a half-replayed room
    serving stale state — restore fails, room marked finished, clear 410
    (review finding)."""
    import json as _json
    import os

    from game_engine_tpu.server.api import AppContext

    sp = str(tmp_path / "rooms.json")
    ctx = AppContext(sp)
    _, d = ctx.handle("POST", "/api/rooms/create", {},
                      {"gameName": "werewolf", "playerName": "Corrupt"})
    rid = d["room"]["roomId"]
    ctx.handle("POST", "/api/rooms/add-bot", {}, {"roomId": rid})
    ctx.handle("POST", f"/api/rooms/{rid}/start", {}, {"seed": 11})
    ctx.handle("POST", f"/api/rooms/{rid}/continue", {}, {})
    del ctx

    path = sp + ".rooms/" + rid + ".jsonl"
    lines = open(path).read().splitlines()
    assert len(lines) >= 3
    lines[2] = _json.dumps({"e": "chat", "text": "missing pid"})  # malformed
    open(path, "w").write("\n".join(lines) + "\n")

    ctx2 = AppContext(sp)
    assert not ctx2.host.has_room(rid), "half-replayed room left registered"
    code, data = ctx2.handle("GET", f"/api/rooms/{rid}/state",
                             {"playerId": ["1"]}, {})
    assert code == 410, (code, data)
    assert os.path.exists(path)  # journal preserved as evidence


def test_replay_injects_journaled_bot_reply_without_recompute(tmp_path):
    """New journals record the bot reply verbatim; restart recovery posts
    it back instead of re-running the responder — so a changed (or absent)
    --chat-lm checkpoint cannot diverge the restored chat log, and startup
    never pays an LM decode per logged message."""
    from game_engine_tpu.server.manager import GameHost

    pd = str(tmp_path / "journals")
    calls = []

    def fake_lm(ctx):
        calls.append(ctx)
        return f"lm-reply-{len(calls)}"

    host = GameHost(persist_dir=pd)
    host._chat_lm_hook = fake_lm  # as if started with --chat-lm
    host.start_room("r1", "werewolf", 5, seed=4)
    host.post_chat("r1", 1, "hello there")
    host.post_chat("r1", 1, "to Bot 2: who looks guilty?")
    ref = host.chat_messages("r1", 1)
    assert any(m["message"].startswith("lm-reply") for m in ref)
    n_calls = len(calls)
    assert n_calls >= 2

    # restart WITHOUT the LM: replay must inject the recorded replies
    host2 = GameHost(persist_dir=pd)
    assert host2.restore_room("r1")
    got = host2.chat_messages("r1", 1)
    assert [m["message"] for m in got] == [m["message"] for m in ref]
    assert [m["id"] for m in got] == [m["id"] for m in ref]
    assert len(calls) == n_calls  # the hook never ran again


def test_spectator_view_masks_everything_private(tmp_path):
    """playerId=0 (no seat) is a spectator: every SELF/TEAM field masked,
    only public-audience items visible — watching a room leaks nothing."""
    from game_engine_tpu.server.api import AppContext

    ctx = AppContext(None)
    _, d = ctx.handle("POST", "/api/rooms/create", {},
                      {"gameName": "werewolf", "playerName": "A"})
    rid = d["room"]["roomId"]
    ctx.handle("POST", "/api/rooms/add-bot", {}, {"roomId": rid})
    ctx.handle("POST", f"/api/rooms/{rid}/start", {}, {"seed": 2})
    ctx.handle("POST", f"/api/rooms/{rid}/continue", {}, {})
    code, spec = ctx.handle("GET", f"/api/rooms/{rid}/state",
                            {"playerId": ["0"]}, {})
    assert code == 200
    assert all(r.get("role") is None for r in spec["player_states"].values())
    _, p1 = ctx.handle("GET", f"/api/rooms/{rid}/state", {"playerId": ["1"]}, {})
    assert p1["player_states"]["1"]["role"]  # a seat still sees itself
    assert len(spec["items"]) <= len(p1["items"])
