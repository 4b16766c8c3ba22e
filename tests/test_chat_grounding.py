"""Chat grounding (VERDICT r2 item 5): a question naming ANY declared
player-state field gets the actual value (public fields) or a guarded
refusal that names the field without leaking it (hidden fields) — never a
generic deflection. The unmatched-intent fallback quotes the bot's own
public standing. Reference behavior being determinized: ChatBotNode answers
from the full game context (agent/game_agent_v2.py:351-466)."""

import re

import pytest

from game_engine_tpu.server.manager import GameHost


def _start(game, seed=4, n=None):
    host = GameHost(backend="native")
    host.start_room("g", game, n or 4, seed=seed, human_seats=[1])
    return host


def _reply(host, text):
    out = host.post_chat("g", 1, f"to Bot 2: {text}")
    assert len(out) == 2, out
    return out[1]["message"]


def test_every_public_field_answered_with_the_true_value():
    """Scripted interrogation: every declared field of gift-circle is
    public; each question's reply must contain the bot's actual value."""
    host = _start("gift-circle")
    # play a couple of rounds so values are non-trivial
    for _ in range(6):
        snap = host.run_until_input_needed("g")
        if snap["done"]:
            break
        for pid in snap["waiting_on"]:
            host.queue_action("g", pid, 2)
    snap = host.snapshot("g")
    me = snap["player_states"]["2"]
    for field in ("coins", "gifts_received", "rounds"):
        reply = _reply(host, f"what is your {field.replace('_', ' ')}?")
        want = str(int(me[field]))
        assert re.search(rf"\b{want}\b", reply), (field, want, reply)
        assert field.replace("_", " ") in reply, (field, reply)


def test_other_players_public_fields_answered():
    host = _start("gift-circle")
    for _ in range(4):
        snap = host.run_until_input_needed("g")
        if snap["done"]:
            break
        for pid in snap["waiting_on"]:
            host.queue_action("g", pid, 3)
    snap = host.snapshot("g")
    p3 = snap["player_states"]["3"]
    reply = _reply(host, "how many coins does Player 3 have?")
    assert re.search(rf"\b{int(p3['coins'])}\b", reply), (p3["coins"], reply)
    assert p3["name"] in reply or "Player 3" in reply, reply


def test_hidden_fields_guarded_not_leaked():
    """Werewolf roles/teams are hidden information: the bot must refuse BY
    NAME without revealing the value (a wolf saying 'my role is Werewolf'
    would break the game; a generic deflection would be round-2's gap)."""
    host = _start("werewolf", n=6)
    host.run_until_input_needed("g")
    snap = host.snapshot("g")
    role = snap["player_states"]["2"]["role"]
    reply = _reply(host, "what is your role?")
    assert "role" in reply.lower(), reply
    assert role.lower() not in reply.lower(), (role, reply)
    reply2 = _reply(host, "what is Player 3's team?")
    team = snap["player_states"]["3"]["team"]
    assert "team" in reply2.lower(), reply2
    assert team.lower() not in reply2.lower(), (team, reply2)


def test_public_boolean_field_answered():
    host = _start("werewolf", n=6)
    host.run_until_input_needed("g")
    reply = _reply(host, "are you still alive? tell me your is_alive")
    assert re.search(r"\byes\b", reply), reply


def test_fallback_quotes_public_standing():
    """An unmatched question must quote the bot's real public fields, not
    deflect ('Noted, back to the game' was round-2's ceiling)."""
    host = _start("gift-circle")
    host.run_until_input_needed("g")
    snap = host.snapshot("g")
    me = snap["player_states"]["2"]
    reply = _reply(host, "give me your full report please")
    assert "coins" in reply, reply
    assert re.search(rf"\bcoins {int(me['coins'])}\b", reply), (me, reply)


def test_field_answers_outrank_lm_hook():
    """With --chat-lm active, exact state questions still come from the
    grounded composer (the current LM is not trained on field facts);
    roleplay questions still go to the LM."""
    from game_engine_tpu.server.chat import ChatRoom

    calls = []

    def fake_lm(ctx):
        calls.append(ctx)
        return "a stylish but ungrounded reply"

    chat = ChatRoom("r", seed=1, lm_hook=fake_lm)
    snap = {"player_states": {
        "1": {"name": "Ada", "coins": 7, "is_alive": True},
        "2": {"name": "Bot", "coins": 4, "is_alive": True},
    }, "current_phase_name": "Trading"}
    msg = chat.bot_reply(1, "Ada", "to Bot 2: how many coins do you have?", snap)
    assert "4" in msg.message and not calls, (msg.message, calls)
    msg2 = chat.bot_reply(1, "Ada", "to Bot 2: hello there", snap)
    assert msg2.message == "a stylish but ungrounded reply" and calls


def test_interrogation_replay_bit_identical(tmp_path):
    """Grounded chat stays journal-replayable."""
    from game_engine_tpu.server.api import AppContext

    sp = str(tmp_path / "rooms.json")
    ctx = AppContext(sp, backend="native")
    _, d = ctx.handle("POST", "/api/rooms/create", {},
                      {"gameName": "gift-circle", "playerName": "Q"})
    rid = d["room"]["roomId"]
    ctx.handle("POST", "/api/rooms/add-bot", {}, {"roomId": rid})
    ctx.handle("POST", f"/api/rooms/{rid}/start", {}, {"seed": 8})
    ctx.handle("POST", f"/api/rooms/{rid}/continue", {}, {})
    ctx.handle("POST", f"/api/rooms/{rid}/chat", {},
               {"playerId": 1, "message": "to Bot 2: what are your coins?"})
    _, ref = ctx.handle("GET", f"/api/rooms/{rid}/chat", {"playerId": ["1"]}, {})
    del ctx
    ctx2 = AppContext(sp, backend="native")
    _, got = ctx2.handle("GET", f"/api/rooms/{rid}/chat", {"playerId": ["1"]}, {})
    assert got["messages"] == ref["messages"]


def test_role_assigned_fields_guarded():
    """Fields written by role assignment (night_action_eligible in
    werewolf-family games) correlate with the hidden role — chat guards
    them even though the engine's observation contract is looser."""
    host = _start("gold-rush", n=5)
    host.run_until_input_needed("g")
    reply = _reply(host, "do you have night action eligible?")
    assert "night action eligible" in reply.lower(), reply
    assert not re.search(r"\b(yes|no)\b", reply.lower()), reply
    # the fallback report must not quote them either
    reply2 = _reply(host, "give me your full report please")
    assert "night action eligible" not in reply2.lower(), reply2
