"""v2 chat intents — rules / history / advice — grounded in the DSL phase
guide, the game-notes log, and the host's waiting_on set. The reference's
ChatBotNode covers these because the full DSL + game context rides its LLM
prompt (reference: agent/game_agent_v2.py:351-466); here each intent quotes
the same ground truth deterministically, and the learned tier is gated on a
checkpoint that actually trained on the new context segments (hook.kinds2).
"""

import re

from game_engine_tpu.gamespec.compile import compile_game
from game_engine_tpu.gamespec.parser import load_builtin
from game_engine_tpu.server.chat import (
    ChatRoom,
    lm_may_serve,
    phase_guide_from_spec,
)


def _snapshot(**over):
    snap = {
        "player_states": {
            "1": {"name": "Alba", "is_alive": True, "coins": 7},
            "2": {"name": "Boro", "is_alive": True, "coins": 3},
            "3": {"name": "Ciri", "is_alive": True, "coins": 11},
            "4": {"name": "Dax", "is_alive": False, "coins": 0},
        },
        "current_phase_name": "Market",
        "deadPlayers": [4],
    }
    snap.update(over)
    return snap


def _reply(room, q, snap):
    room.post(1, "Alba", q)
    plan = room.plan_reply(1, "Alba", q, snap)
    assert plan is not None
    return plan


GUIDE = {
    "market": {"desc": "Buy low, sell high.", "done": "the timer runs out"},
    "__win__": "Richest merchant after five rounds wins.",
}


def test_rules_quotes_the_phase_guide():
    room = ChatRoom("r", seed=1, phase_guide=GUIDE)
    plan = _reply(room, "what are the rules?", _snapshot())
    assert "Buy low, sell high." in plan["composed"]
    assert "It ends when the timer runs out." in plan["composed"]
    assert "|Gd=Buy low, sell high. It ends when the timer runs out." in plan["context"]


def test_rules_win_question_quotes_the_win_text():
    room = ChatRoom("r", seed=1, phase_guide=GUIDE)
    plan = _reply(room, "how do I win?", _snapshot())
    assert "Richest merchant after five rounds wins." in plan["composed"]
    assert "|Gd=Richest merchant" in plan["context"]


def test_rules_without_guide_degrades_gracefully():
    room = ChatRoom("r", seed=1)  # no guide
    plan = _reply(room, "what is this phase?", _snapshot())
    assert "Market" in plan["composed"]
    assert "|Gd=" in plan["context"]


def test_history_quotes_recent_game_notes():
    room = ChatRoom("r", seed=1)
    snap = _snapshot(game_notes=[
        {"text": "Round 1 opened the market."},
        {"text": "Boro raided Ciri."},
        {"text": "Dax was eliminated."},
    ])
    plan = _reply(room, "what happened so far?", snap)
    assert "Boro raided Ciri." in plan["composed"]
    assert "Dax was eliminated." in plan["composed"]
    assert "Round 1" not in plan["composed"]  # only the last two notes
    assert "|Hn=Boro raided Ciri. Then: Dax was eliminated." in plan["context"]


def test_history_without_notes_reports_the_fallen():
    room = ChatRoom("r", seed=1)
    plan = _reply(room, "who died?", _snapshot())
    assert "Dax" in plan["composed"]


def test_advice_counsels_the_waiting_sender():
    room = ChatRoom("r", seed=1)
    snap = _snapshot(waiting_on=[1])
    plan = _reply(room, "who should I vote for?", snap)
    # counsels the sender with a named suspect (never the bot's own vote)
    assert re.search(r"You're up|your move|waiting on you", plan["composed"])
    assert "|Wt=1" in plan["context"]
    snap2 = _snapshot(waiting_on=[])
    room2 = ChatRoom("r2", seed=1)
    plan2 = _reply(room2, "any advice?", snap2)
    assert "|Wt=0" in plan2["context"]


def test_v2_kinds_gated_on_kinds2_hook():
    """An old hook — even a grounded-trained one — never serves v2 plans;
    a kinds2 hook does."""
    def old(ctx):
        return "garble"

    old.grounded = True  # grounded override must NOT leak to v2 kinds
    room = ChatRoom("r", seed=1, lm_hook=old, phase_guide=GUIDE)
    plan = _reply(room, "what are the rules?", _snapshot())
    assert plan["lm_ok"] is False
    assert not lm_may_serve(old, plan)

    def new(ctx):
        return "Learned rules reply."

    new.kinds2 = True
    room2 = ChatRoom("r2", seed=1, lm_hook=new, phase_guide=GUIDE)
    plan2 = _reply(room2, "what are the rules?", _snapshot())
    assert plan2["lm_ok"] is True and lm_may_serve(new, plan2)


def test_original_kinds_keep_byte_identical_contexts():
    """Pre-v2 checkpoints must see unchanged serving contexts for the
    original intents — no Gd=/Hn=/Wt= segments outside the v2 kinds."""
    room = ChatRoom("r", seed=1)
    for q in ("what's the score?", "hello there", "who is still alive?",
              "how will you vote?", "I suspect player 2"):
        plan = _reply(room, q, _snapshot())
        assert not re.search(r"\|(Gd|Hn|Wt)=", plan["context"]), (q, plan)


def test_phase_guide_from_spec_builds_from_the_dsl():
    spec = compile_game(load_builtin("werewolf")).spec
    guide = phase_guide_from_spec(spec)
    assert guide["__win__"]
    # every DSL phase is present, keyed by lowercased name, with a digest
    for ph in spec.phases.values():
        row = guide[ph.name.lower()]
        assert isinstance(row["desc"], str) and row["done"]


def test_v2_stems_do_not_hijack_older_intents():
    """Narrow triggers: 'so far' inside a score question stays score, and
    an incidental 'rules' mention stays out of the rules lecture."""
    room = ChatRoom("r", seed=1, phase_guide=GUIDE)
    plan = _reply(room, "what's the score so far?", _snapshot())
    assert plan["context"].startswith("K=score|")
    plan2 = _reply(room, "no rules against that, right?", _snapshot())
    assert "|Gd=" not in plan2["context"]


def test_legacy_query_pin_drops_v2_pairs():
    """build_corpus(queries=_QUERIES_V1) is a legacy-distribution eval:
    v1 queries the NEW keyword table reclassifies into v2 kinds ('who
    died?' -> history) must not surface pairs whose contexts the old
    checkpoint never trained on."""
    from game_engine_tpu.policies import chat_lm as C

    pairs = C.build_corpus(games=("werewolf",), seeds=range(2),
                           max_pairs=300, queries=C._QUERIES_V1)
    assert pairs
    assert not any(re.search(r"\|(Gd|Hn|Wt)=", ctx) for ctx, _ in pairs)


def test_phase_guide_covers_every_catalog_phase_name():
    """The rules intent looks up guide[current_phase_name.lower()]; every
    phase name a room can report must resolve for every catalog game."""
    import os

    from game_engine_tpu.gamespec.parser import games_dir

    for fn in sorted(os.listdir(games_dir())):
        if not fn.endswith((".yaml", ".yml")):
            continue
        spec = load_builtin(os.path.splitext(fn)[0])
        guide = phase_guide_from_spec(spec)
        for ph in spec.phases.values():
            row = guide.get(ph.name.lower())
            assert row is not None and row["done"], (fn, ph.name)


def test_shipped_checkpoint_v2_intents_composer_disabled():
    """The shipped LM, ALONE, answers held-out v2-intent questions
    faithfully — the promotion exit test for a kinds2 retrain (mirrors
    the grounded interrogation test in test_chat_grounded_lm.py). Skipped
    until a kinds2-trained checkpoint is promoted."""
    import os

    import pytest

    from game_engine_tpu.policies import chat_lm as C

    ckpt = os.path.join(os.path.dirname(__file__), "..",
                        "docs", "checkpoints", "chat_lm.npz")
    if not os.path.exists(ckpt):
        pytest.skip("no shipped chat LM checkpoint")
    params, cfg = C.load(ckpt)
    if not cfg.kinds2:
        pytest.skip("shipped checkpoint predates v2-intent training")
    hook = C.make_lm_hook(ckpt)
    assert hook.kinds2
    pairs = C.build_corpus(games=("werewolf",), seeds=range(340, 352),
                           max_pairs=4000)
    cases = [(c, r) for c, r in pairs
             if re.search(r"\|(Gd|Hn|Wt)=", c)][:24]
    assert len(cases) >= 8, "corpus produced too few v2-intent pairs"
    def proj(s):
        # score on the tokenizer's encodable projection: the composer's
        # clip ellipsis "…" is outside the byte vocab, so the student can
        # never emit it — comparing raw text mislabels every clipped
        # guide digest as unfaithful (see train/chat_lm.py _evaluate)
        return C.decode_tokens(C.encode_text(s))

    ok = 0
    for ctx, ref in cases:
        out = hook(ctx) or ""
        m = re.search(r"\|(Gd|Hn)=([^|]+)", ctx)
        quoted = proj(m.group(2)) if m else None
        ok += int(quoted in proj(out) if quoted
                  else proj(out) == proj(ref))
    assert ok / len(cases) >= 0.8, f"v2 faithfulness {ok}/{len(cases)}"


def test_intent_classification_precedence():
    """'who should I vote for' is advice (not the bot's own-vote intent);
    'what is this phase' is rules (not status); 'hey, any advice?' is
    advice (greeting prefix must not eat the question)."""
    room = ChatRoom("r", seed=1, phase_guide=GUIDE)
    cases = {
        "who should I vote for?": r"\bWt=",
        "what is this phase?": r"\bGd=",
        "hey, any advice?": r"\bWt=",
        "catch me up": r"\bHn=",
    }
    for q, marker in cases.items():
        plan = _reply(room, q, _snapshot())
        assert re.search(marker, plan["context"]), (q, plan["context"])
