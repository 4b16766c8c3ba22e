"""Round-4 grounded learned-chat tier: the lm_ok bypass is narrowed to
ungrounded checkpoints, grounded decodes are verified before commit, and
the shipped checkpoint answers state interrogations with the template
composer disabled (VERDICT r3 #6). Reference behavior being matched: the
ChatBotNode answers from the full game context
(reference: agent/game_agent_v2.py:351-466)."""

import os
import re

import pytest

from game_engine_tpu.policies import chat_lm as C
from game_engine_tpu.server.chat import (
    ChatRoom,
    grounded_reply_ok,
    lm_may_serve,
)

_CKPT = os.path.join(os.path.dirname(__file__), "..",
                     "docs", "checkpoints", "chat_lm.npz")


def _snapshot():
    return {
        "player_states": {
            "1": {"name": "Alba", "is_alive": True, "coins": 7},
            "2": {"name": "Boro", "is_alive": True, "coins": 3},
            "3": {"name": "Ciri", "is_alive": True, "coins": 11},
        },
        "current_phase_name": "Market",
        "deadPlayers": [],
    }


def _field_plan(room, q="to Bot 2: how many coins do you have?"):
    room.post(1, "Alba", q)
    return room.plan_reply(1, "Alba", q, _snapshot())


def test_ungrounded_hook_keeps_the_template_bypass():
    """An old checkpoint (no .grounded) must not serve field questions —
    the round-3 gate, now keyed on the hook's training provenance."""
    calls = []

    def hook(ctx):
        calls.append(ctx)
        return "seven, I think"

    room = ChatRoom("r", seed=1, lm_hook=hook)
    plan = _field_plan(room)
    assert plan["lm_ok"] is False and plan["grounded"]["val"] == "3"
    assert not lm_may_serve(hook, plan)
    msg = room.bot_reply(1, "Alba", "to Bot 2: how many coins do you have?",
                         _snapshot())
    assert not calls and "3" in msg.message  # template answered, truthfully


def test_grounded_hook_serves_field_questions_and_is_verified():
    """A grounded-trained hook answers field questions; the commit path
    verifies the decode quotes the exact value and falls back when not."""
    def good(ctx):
        return "Easy one: my coins is 3."

    good.grounded = True
    room = ChatRoom("r", seed=1, lm_hook=good)
    plan = _field_plan(room)
    assert lm_may_serve(good, plan)
    msg = room.commit_reply(plan, good(plan["context"]))
    assert msg.message == "Easy one: my coins is 3."

    def bad(ctx):  # wrong value — must NOT reach the player
        return "Easy one: my coins is 7."

    bad.grounded = True
    room2 = ChatRoom("r2", seed=1, lm_hook=bad)
    plan2 = _field_plan(room2)
    msg2 = room2.commit_reply(plan2, bad(plan2["context"]))
    assert "7" not in msg2.message and "3" in msg2.message  # template fallback


def test_grounded_reply_ok_rules():
    g = {"fname": "coins", "val": "3", "hidden": False}
    assert grounded_reply_ok("My coins is 3.", g)
    assert not grounded_reply_ok("My coins is 13.", g)  # 3 inside 13
    assert not grounded_reply_ok("I have 3.", g)  # field unnamed
    h = {"fname": "role", "val": None, "hidden": True}
    assert grounded_reply_ok("My role is my business.", h)
    assert not grounded_reply_ok("I will not say.", h)


def test_hidden_value_never_rides_the_context():
    """The G= segment withholds hidden values — the student cannot leak
    what it never sees."""
    room = ChatRoom("r", seed=1, visibility={"coins": 1})
    plan = _field_plan(room)
    assert plan["grounded"]["hidden"] is True
    m = re.search(r"\|G=([^|]*)", plan["context"])
    assert m and ";3;" not in m.group(0) and ";;" in m.group(0)


def test_shipped_checkpoint_interrogation_composer_disabled():
    """The shipped LM, ALONE (no composer fallback), answers held-out
    grounded interrogations faithfully — the VERDICT r3 #6 exit test."""
    if not os.path.exists(_CKPT):
        pytest.skip("no shipped chat LM checkpoint")
    params, cfg = C.load(_CKPT)
    if not cfg.grounded:
        pytest.skip("shipped checkpoint predates grounded training")
    hook = C.make_lm_hook(_CKPT)
    assert hook.grounded
    # held-out rooms (training corpus uses seeds 0..259), drawn from the
    # query distribution this checkpoint trained on (see test_chat_lm.py)
    pairs = C.build_corpus(games=("werewolf",), seeds=range(320, 332),
                           max_pairs=4000,
                           queries=None if cfg.kinds2 else C._QUERIES_V1)
    cases = [(ctx, ref) for ctx, ref in pairs if "|G=" in ctx][:24]
    assert len(cases) >= 12, "corpus produced too few grounded pairs"
    ok = 0
    for ctx, ref in cases:
        out = hook(ctx)  # the learned tier only — composer never consulted
        gm = re.search(r"\|G=([^|;]*);([^|;]*);([^|;]*);(h|p)(s|o)", ctx)
        assert gm
        g = {"fname": gm.group(2), "val": gm.group(3) or None,
             "hidden": gm.group(4) == "h"}
        ok += int(bool(out) and grounded_reply_ok(out.translate(C._FOLD), g))
    # the serving gate falls back per-reply on the residue, so players
    # always see a faithful answer; the LM itself must carry >=80%
    assert ok / len(cases) >= 0.8, f"grounded faithfulness {ok}/{len(cases)}"
