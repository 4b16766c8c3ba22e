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
