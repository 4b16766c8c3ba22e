"""Web-client tests: the lobby flow + play canvas served by the host.

No browser exists in the test image, so this suite checks the UI at two
levels: (1) static DOM-contract checks — every element id the JS touches
exists in the served HTML, and every card type in the catalog has a
renderer; (2) a headless client that mimics app.js's behavior exactly
(register -> library -> create/join -> room lobby -> start -> poll state ->
click voting panels / submit text / continue) and plays full games through
the same endpoints and item shapes the browser uses."""

import json
import re
import threading
from http.client import HTTPConnection

import pytest

from game_engine_tpu.server.api import make_server
from game_engine_tpu.view.cards import CARD_TYPES


@pytest.fixture(scope="module")
def server():
    srv = make_server(port=0, backend="native")
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()


def req(server, method, path, body=None):
    conn = HTTPConnection("127.0.0.1", server.server_address[1], timeout=30)
    payload = json.dumps(body) if body is not None else None
    conn.request(method, path, body=payload,
                 headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    raw = resp.read().decode()
    conn.close()
    ctype = resp.getheader("Content-Type") or ""
    return resp.status, (json.loads(raw) if "json" in ctype else raw), ctype


# ---------------------------------------------------------------------------
# DOM / asset contract
# ---------------------------------------------------------------------------


def _asset(server, path):
    code, body, ctype = req(server, "GET", path)
    assert code == 200, path
    return body, ctype


def test_pages_and_assets_served(server):
    for path, kind in [("/", "html"), ("/register", "html"), ("/library", "html"),
                       ("/room", "html"), ("/play", "html"),
                       ("/static/style.css", "css"), ("/static/app.js", "javascript"),
                       ("/static/cards.js", "javascript"),
                       ("/static/lobby.js", "javascript")]:
        body, ctype = _asset(server, path)
        assert kind in ctype, (path, ctype)
        assert len(body) > 200, path
    code, _, _ = req(server, "GET", "/static/../secrets")
    assert code == 404  # no traversal


def test_js_dom_contract(server):
    """Every getElementById target in the JS exists in the page that loads
    that script — catches mount-point typos without a browser."""
    pages = {
        "app.js": _asset(server, "/play")[0],
        "lobby.js": (_asset(server, "/register")[0] + _asset(server, "/library")[0]
                     + _asset(server, "/room")[0]),
    }
    for script, html in pages.items():
        js, _ = _asset(server, f"/static/{script}")
        ids = set(re.findall(r"""getElementById\(["']([\w-]+)["']\)""", js))
        ids |= set(re.findall(r"""\bel\(["']([\w-]+)["']\)""", js))
        declared = set(re.findall(r"""id=["']([\w-]+)["']""", html))
        declared |= set(re.findall(r"""\bid:\s*["']([\w-]+)["']""", js))  # js-created
        missing = ids - declared
        assert not missing, f"{script} touches ids missing from HTML: {missing}"
    # play.html loads both scripts it needs
    play = pages["app.js"]
    assert "/static/cards.js" in play and "/static/app.js" in play


def test_every_card_type_has_a_renderer(server):
    """cards.js must cover the full 22-type catalog (reference:
    src/lib/canvas/types.ts:19-45; CardRenderer.tsx renderers)."""
    js, _ = _asset(server, "/static/cards.js")
    rendered = set(re.findall(r"^\s{4}(\w+)\(item", js, re.MULTILINE))
    missing = set(CARD_TYPES) - rendered
    assert not missing, f"card types without a renderer: {missing}"


# ---------------------------------------------------------------------------
# Headless client — mirrors app.js / lobby.js behavior over the same API
# ---------------------------------------------------------------------------


class HeadlessClient:
    """One 'browser': a registered player driving the UI flow."""

    def __init__(self, server, name):
        self.server = server
        self.name = name  # register page: sessionStorage.playerSession
        self.room_id = None
        self.player_id = None

    def _api(self, method, path, body=None):
        code, data, _ = req(self.server, method, path, body)
        assert code == 200, (path, data)
        return data

    # lobby.js flows
    def library(self):
        return self._api("GET", "/api/games")["games"]

    def create_room(self, game):
        d = self._api("POST", "/api/rooms/create",
                      {"gameName": game, "playerName": self.name})
        self.room_id = d["room"]["roomId"]
        self.player_id = d["player"]["id"]
        return self.room_id

    def join(self, room_id):
        d = self._api("POST", "/api/rooms/join",
                      {"roomId": room_id, "playerName": self.name})
        self.room_id = room_id
        self.player_id = d["player"]["id"]

    def room_lobby(self):
        return self._api("GET", f"/api/rooms/{self.room_id}")

    def add_bots(self):
        return self._api("POST", "/api/rooms/add-bot", {"roomId": self.room_id})

    def start(self, seed=None, rounds=None):
        body = {}
        if seed is not None:
            body["seed"] = seed
        if rounds:
            body["roundsPerPlayer"] = rounds
        return self._api("POST", f"/api/rooms/{self.room_id}/start", body)

    # app.js flows
    def state(self):
        return self._api("GET",
                         f"/api/rooms/{self.room_id}/state?playerId={self.player_id}")

    def continue_(self, watch=None):
        """app.js doContinue: step phase-by-phase, watching every transition,
        until the game ends or a human must act. ``watch`` sees each
        viewer-filtered intermediate snapshot (what the browser renders)."""
        snap = None
        for _ in range(400):
            snap = self._api("POST", f"/api/rooms/{self.room_id}/step",
                             {"playerId": self.player_id})
            if watch:
                watch(snap)
            if snap.get("done") or snap.get("waiting_on"):
                return snap
        raise AssertionError("continue never reached a stop condition")

    def my_visible_items(self, snap, card_type):
        return [i for i in snap["items"] if i["type"] == card_type]

    def act_if_needed(self, snap, text=None):
        """What app.js does when 'your move': click the first voting option,
        or submit text into the broadcast input."""
        if self.player_id not in snap.get("waiting_on", []):
            return False
        panels = self.my_visible_items(snap, "voting_panel")
        inputs = self.my_visible_items(snap, "broadcast_input")
        if inputs and text is not None:
            self._api("POST", f"/api/rooms/{self.room_id}/action",
                      {"playerId": self.player_id, "choice": 1, "text": text})
        elif panels:
            assert panels[0]["data"]["options"], "voting panel with no options"
            self._api("POST", f"/api/rooms/{self.room_id}/vote",
                      {"playerId": self.player_id, "option": 1})
        else:
            self._api("POST", f"/api/rooms/{self.room_id}/action",
                      {"playerId": self.player_id, "choice": 1})
        return True

    def chat(self, message):
        return self._api("POST", f"/api/rooms/{self.room_id}/chat",
                         {"playerId": self.player_id, "message": message})


def test_two_browsers_play_werewolf_through_the_ui(server):
    """Two human clients (the VERDICT multi-human bar) drive a full werewolf
    game through the UI contract: lobby -> role cards (private) -> voting
    panels -> death markers -> game over."""
    alice = HeadlessClient(server, "Alice")
    bob = HeadlessClient(server, "Bob")

    games = alice.library()
    assert any("werewolf" in g["name"] for g in games)
    room = alice.create_room("werewolf")
    bob.join(room)
    lobby = alice.room_lobby()
    assert [p["name"] for p in lobby["players"]] == ["Alice", "Bob"]
    alice.add_bots()
    lobby = alice.room_lobby()
    assert sum(1 for p in lobby["players"] if p["isBot"]) >= 2
    snap = alice.start(seed=21)
    assert snap["human_seats"] == [1, 2]

    saw = {"character_card": False, "voting_panel": False, "death_marker": False,
           "phase_indicator": False, "avatar_set": False, "night_overlay": False}

    def watch(view):  # every phase the browser renders while stepping
        for t in saw:
            if any(i["type"] == t for i in view.get("items", [])):
                saw[t] = True

    bob_acted = False
    for _ in range(120):
        snap = alice.continue_(watch=watch)
        if snap["done"]:
            break
        for c in (alice, bob):
            view = c.state()
            for t in saw:
                if c.my_visible_items(view, t):
                    saw[t] = True
            # privacy: my character card is mine alone; server-side masking
            for cc in c.my_visible_items(view, "character_card"):
                assert cc["data"]["audience_ids"] == [str(c.player_id)]
            acted = c.act_if_needed(view)
            bob_acted = bob_acted or (c is bob and acted)
    assert snap["done"], "werewolf never finished through the UI"
    missing = [t for t, v in saw.items() if not v]
    assert not missing, f"UI never showed: {missing}"
    assert bob_acted, "second human never had to act"

    # dead players render as grayscale skulls client-side: the data contract
    # is deadPlayers + avatar_set presence
    final = alice.state()
    assert final["deadPlayers"], "nobody died in a finished werewolf game"

    # chat through the UI
    msgs = alice.chat("to Bot 3: who do you suspect?")["messages"]
    assert len(msgs) >= 1


def test_sse_state_push(server):
    """/events streams viewer-filtered state snapshots whenever stateVersion
    moves — the push half of the reference's useCoAgent sync."""
    h = HeadlessClient(server, "Streamer")
    h.create_room("werewolf")
    h.add_bots()
    h.start(seed=4)

    conn = HTTPConnection("127.0.0.1", server.server_address[1], timeout=10)
    conn.request("GET", f"/api/rooms/{h.room_id}/events?playerId=1")
    resp = conn.getresponse()
    assert resp.status == 200
    assert "text/event-stream" in (resp.getheader("Content-Type") or "")

    def next_event():
        buf = b""
        while b"\n\n" not in buf:
            chunk = resp.read1(4096)
            assert chunk, "stream closed early"
            buf += chunk
        line = [ln for ln in buf.split(b"\n") if ln.startswith(b"data: ")][0]
        return json.loads(line[len(b"data: "):])

    first = next_event()  # initial snapshot pushes immediately
    assert first["current_phase_id"] == 0
    # advance the game from a different connection -> a push arrives
    h.continue_()
    nxt = next_event()
    assert nxt["stateVersion"] > first["stateVersion"]
    assert nxt["current_phase_id"] != 0 or nxt["stateVersion"] >= 1
    # the stream is viewer-filtered: no other player's private card
    for it in nxt.get("items", []):
        assert it["data"]["audience_type"] or "1" in it["data"]["audience_ids"]
    conn.close()


def test_two_truths_statement_board_through_the_ui(server):
    """Free-text statements typed in the broadcast input appear on the
    statement board; voters pick among the actual statement texts."""
    host = HeadlessClient(server, "Stately")
    host.create_room("two-truths")
    host.add_bots()
    host.start(seed=6)
    my_statements = "I fly kites\nI detest mornings\nI speak Basque"
    seen = {"mine_on_board": False, "statements_as_options": False}

    def watch(view):
        for board in view.get("items", []):
            if board["type"] == "statement_board" and \
                    board["data"].get("statements") == my_statements.split("\n"):
                seen["mine_on_board"] = True
            if board["type"] == "voting_panel":
                opts = board["data"].get("options", [])
                if opts and not all(o.isdigit() for o in opts):
                    seen["statements_as_options"] = True

    for _ in range(100):
        snap = host.continue_(watch=watch)
        if snap["done"]:
            break
        view = host.state()
        watch(view)
        host.act_if_needed(view, text=my_statements)
    assert snap["done"]
    assert seen["mine_on_board"], "submitted statements never reached the board"
    assert seen["statements_as_options"], "vote options were bare numbers"


def test_bluff_court_through_the_ui(server):
    """The round-2 bluff archetype is playable through the same UI, with
    persistent influence counters."""
    h = HeadlessClient(server, "Duke")
    h.create_room("bluff-court")
    h.add_bots()
    h.start(seed=2)
    saw_influence = False
    for _ in range(150):
        snap = h.continue_()
        if snap["done"]:
            break
        view = h.state()
        if h.my_visible_items(view, "influence_set"):
            saw_influence = True
        h.act_if_needed(view)
    assert snap["done"]
    assert saw_influence, "influence counters never rendered"


@pytest.mark.parametrize("game", [
    "werewolf-(mafia)", "two-truths-and-a-lie", "bluff-court",
    "market-raid", "last-stand", "odd-one-out", "gold-rush", "bounty-arena",
    "midnight-circle", "auction-house", "relic-auction", "trophy-arena",
    "gift-circle", "handshake-pact", "speed-track", "relic-draft",
    "tide-pool", "cult-of-the-depths", "potlatch", "raven-moot",
    "storm-forge", "shadow-fold", "dragon-hoard", "moon-rally",
])
def test_every_catalog_game_playable_through_the_ui(server, game):
    """Completeness guard: every shipped catalog game plays to completion
    through the exact client flow (create -> bots -> start -> act/continue)."""
    h = HeadlessClient(server, f"cat-{game[:8]}")
    h.create_room(game)
    h.add_bots()
    h.start(seed=13)
    snap = None
    for _ in range(250):
        snap = h.continue_()
        if snap["done"]:
            break
        view = h.state()
        acted = h.act_if_needed(view, text="one\ntwo\nthree")
        assert acted or snap["done"] or snap.get("waiting_on") != [h.player_id], \
            "client had the move but found nothing to act on"
    assert snap and snap["done"], f"{game} never finished through the UI"
