"""Chat subsystem: visibility gates, bot addressing, dead-player exclusion."""

from game_engine_tpu.server.chat import ChatRoom


def _snapshot(alive=(True, True, True, True)):
    return {
        "player_states": {
            str(i + 1): {"name": f"Player {i + 1}", "is_alive": a}
            for i, a in enumerate(alive)
        }
    }


def test_public_chat_and_bot_reply():
    chat = ChatRoom("r1", seed=1)
    reply = chat.bot_reply(1, "Alice", "hello everyone", _snapshot())
    assert reply is not None
    assert reply.visibility == "public"
    assert int(reply.playerId) != 1  # human never auto-replies
    assert "Alice" in reply.message or reply.message


def test_addressed_bot_replies_privately():
    chat = ChatRoom("r2", seed=2)
    chat.post(1, "Alice", "to Bot 3: what is your role?")
    reply = chat.bot_reply(1, "Alice", "to Bot 3: what is your role?", _snapshot())
    assert reply.playerId == "3"
    assert reply.visibility == "private"
    assert reply.target_audience == ["1"]
    # visibility: only sender and the bot see it
    assert reply in chat.visible(1)
    assert reply in chat.visible(3)
    assert reply not in chat.visible(2)


def test_dead_bots_never_speak():
    chat = ChatRoom("r3", seed=3)
    # only bot 2 alive; bots 3,4 dead
    snap = _snapshot(alive=(True, True, False, False))
    for i in range(10):
        reply = chat.bot_reply(1, "Alice", f"message {i}", snap)
        assert reply.playerId == "2"
    # addressed dead bot: no reply
    assert chat.bot_reply(1, "Alice", "to Bot 4: hi", snap) is None


def test_hidden_messages_filtered():
    chat = ChatRoom("r4")
    m = chat.post(2, "Bob", "secret planning", visibility="hidden")
    assert m not in chat.visible(1)
    assert m not in chat.visible(2)
    s = chat.system("Game started")
    assert s in chat.visible(1)


def test_keyword_responses_deterministic():
    a = ChatRoom("r5", seed=9)
    b = ChatRoom("r5", seed=9)
    ra = a.bot_reply(1, "Al", "I suspect player 3 is the werewolf", _snapshot())
    rb = b.bot_reply(1, "Al", "I suspect player 3 is the werewolf", _snapshot())
    assert ra.message == rb.message and ra.playerId == rb.playerId


# ---------------------------------------------------------------------------
# personas (round 4): a stable per-(room, bot) voice on the template tier
# ---------------------------------------------------------------------------

def _ww_snapshot(n=5):
    return {
        "current_phase_name": "Day Discussion",
        "deadPlayers": [],
        "player_states": {
            str(i): {"name": f"P{i}", "is_alive": True} for i in range(1, n + 1)
        },
    }


def test_persona_is_stable_and_tics_come_from_one_pool():
    from game_engine_tpu.server.chat import PERSONAS, ChatRoom, persona_of

    room = ChatRoom("r", seed=11)
    snap = _ww_snapshot()
    pid = persona_of(11, 3)
    mine = set(PERSONAS[pid][1]) | set(PERSONAS[pid][2])
    others = set()
    for j, (_, o, c) in enumerate(PERSONAS):
        if j != pid:
            others |= set(o) | set(c)
    others -= mine  # tics shared across personas (none today) can't distinguish
    saw_tic = False
    for i in range(24):
        room.post(1, "V", f"to Bot 3: hello there {i}")
        msg = room.bot_reply(1, "V", f"to Bot 3: hello there {i}", snap)
        assert msg is not None
        if any(msg.message.startswith(t) or msg.message.endswith(t)
               for t in mine):
            saw_tic = True
        assert not any(msg.message.startswith(t) or msg.message.endswith(t)
                       for t in others), msg.message
    assert saw_tic, "persona tics never appeared in 24 replies"
    assert persona_of(11, 3) == pid  # pure function


def test_grounded_field_answers_are_never_decorated():
    from game_engine_tpu.server.chat import PERSONAS, ChatRoom

    room = ChatRoom("r", seed=11)
    snap = _ww_snapshot()
    for st in snap["player_states"].values():
        st["coins"] = 7
    all_tics = set()
    for _, o, c in PERSONAS:
        all_tics |= set(o) | set(c)
    for i in range(8):
        q = f"to Bot 2: what is your coins? ({i})"
        room.post(1, "V", q)
        plan = room.plan_reply(1, "V", q, snap)
        assert plan["lm_ok"] is False  # grounded plan
        assert not any(plan["composed"].startswith(t) or
                       plan["composed"].endswith(t) for t in all_tics)
        room.commit_reply(plan, None)


def test_pe_segment_gated_on_persona_support():
    from game_engine_tpu.server.chat import ChatRoom

    snap = _ww_snapshot()
    room = ChatRoom("r", seed=11)
    room.post(1, "V", "to Bot 3: hello")
    plan = room.plan_reply(1, "V", "to Bot 3: hello", snap)
    assert "|Pe=" not in plan["context"]  # no hook, no corpus flag

    room2 = ChatRoom("r", seed=11)
    room2.persona_ctx = True
    room2.post(1, "V", "to Bot 3: hello")
    plan2 = room2.plan_reply(1, "V", "to Bot 3: hello", snap)
    assert "|Pe=" in plan2["context"]

    room3 = ChatRoom("r", seed=11)
    def hook(ctx):
        return None
    hook.personas = True
    room3.lm_hook = hook
    room3.post(1, "V", "to Bot 3: hello")
    plan3 = room3.plan_reply(1, "V", "to Bot 3: hello", snap)
    assert "|Pe=" in plan3["context"]
    # identical plans modulo the Pe segment: same persona id both ways
    assert plan2["context"] == plan3["context"]


# -- round-4 review fixes -----------------------------------------------------


def test_persona_decoration_recoverable_from_context():
    """The decoration roll must be a pure function of (h mod 12, persona)
    — exactly what the LM context exposes (R=, Pe=) — or byte-identical
    contexts carry different targets and the student trains on noise."""
    from game_engine_tpu.server.chat import decorate_persona

    for pid in range(6):
        for r in range(12):
            outs = {decorate_persona("base reply.", pid, h)
                    for h in (r, r + 12, r + 24, r + 9996)}
            assert len(outs) == 1, (pid, r, outs)


def test_grounded_hidden_requires_refusal_shape():
    """A decode naming a hidden field but asserting a value must FAIL the
    gate (it could coincide with, and so leak, the real hidden value)."""
    from game_engine_tpu.server.chat import grounded_reply_ok

    g = {"fname": "role", "val": None, "hidden": True}
    assert not grounded_reply_ok("My role is werewolf.", g)
    assert grounded_reply_ok(
        "My role is my business, Alba.", g)
    assert grounded_reply_ok(
        "Nice try — my role stays hidden until the game says otherwise.", g)
    assert grounded_reply_ok("Only Boro knows their role.", g)
    # visible facts still require the exact value
    g2 = {"fname": "coins", "val": "7", "hidden": False}
    assert grounded_reply_ok("My coins is 7.", g2)
    assert not grounded_reply_ok("My coins is 9.", g2)
