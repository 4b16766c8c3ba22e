"""Roleplay sampling tier (round-4 continuation): smalltalk chat kinds may
decode with deterministic top-p/temperature sampling for varied in-persona
replies — a step toward the reference ChatBotNode's open roleplay
(reference: agent/game_agent_v2.py:351-466, temperature-sampled gpt-4.1-mini)
WITHOUT giving up replayability: the random stream is splitmix32 over the
context, so a decode is a pure function of (checkpoint, ctx, salt).

State-reporting kinds (status/score/vote/field/suspicion/v2 intents) always
stay greedy — variety is never worth a misreported board
(policies/chat_lm.py SAMPLE_KINDS)."""

import os

import numpy as np
import pytest

from game_engine_tpu.policies import chat_lm as C

_CKPT = os.path.join(os.path.dirname(__file__), "..",
                     "docs", "checkpoints", "chat_lm.npz")


@pytest.fixture(scope="module")
def tiny():
    import jax

    cfg = C.LMConfig(d_model=32, n_layers=1, n_heads=2, max_len=96)
    params = C.init_params(jax.random.PRNGKey(0), cfg)
    return params, cfg


CTX = "K=greeting|P=Day|B=2|N=Bo|S=Al|A=1,2|D=|V=0|R=3|Q=hello there"


def test_sampled_reply_is_deterministic(tiny):
    params, cfg = tiny
    a = C.sampled_reply(params, cfg, CTX, temperature=0.9, salt=1)
    b = C.sampled_reply(params, cfg, CTX, temperature=0.9, salt=1)
    assert a == b  # pure function of (ckpt, ctx, salt)


def test_sampled_reply_near_zero_temperature_matches_greedy(tiny):
    """temperature -> 0 concentrates the nucleus on the argmax token: the
    sampler must reproduce the greedy decode exactly (correctness check of
    the top-p/inverse-CDF math against the known-good argmax path)."""
    params, cfg = tiny
    g = C.greedy_reply(params, cfg, CTX)
    for salt in (0, 1, 2):
        s = C.sampled_reply(params, cfg, CTX, temperature=1e-9, salt=salt)
        assert s == g, (salt, s, g)


def test_ctx_uniforms_properties():
    u = C._ctx_uniforms(CTX, 64, salt=0)
    assert u.shape == (64,) and u.dtype == np.float32
    assert (u >= 0).all() and (u < 1).all()
    assert (u == C._ctx_uniforms(CTX, 64, salt=0)).all()
    assert (u != C._ctx_uniforms(CTX, 64, salt=1)).any()
    assert (u != C._ctx_uniforms(CTX + "x", 64, salt=0)).any()


def test_hook_samples_only_smalltalk_kinds(tiny, tmp_path, monkeypatch):
    """K=greeting goes through the sampler; K=status stays greedy; with
    sample_temp=0 nothing samples (the default path is byte-identical)."""
    params, cfg = tiny
    path = str(tmp_path / "tiny.npz")
    C.save(path, params, cfg)

    calls = []
    real_sampled, real_greedy = C.sampled_reply, C.greedy_reply
    monkeypatch.setattr(C, "sampled_reply",
                        lambda *a, **k: calls.append("s") or real_sampled(*a, **k))
    monkeypatch.setattr(C, "greedy_reply",
                        lambda *a, **k: calls.append("g") or real_greedy(*a, **k))

    hook = C.make_lm_hook(path, sample_temp=0.8)
    assert hook.sampling
    calls.clear()
    hook("K=greeting|P=Day|B=2|N=Bo|S=Al|A=1,2|D=|V=0|R=0|Q=hi")
    assert calls[0] == "s"
    calls.clear()
    hook("K=status|P=Day|B=2|N=Bo|S=Al|A=1,2|D=|V=0|R=0|Q=who is alive?")
    assert calls == ["g"]  # state-reporting kind never samples
    calls.clear()
    hook("K=field|P=Day|B=2|N=Bo|S=Al|A=1,2|D=|V=0|R=0"
         "|G=Bo;coins;3;po|Q=coins?")
    assert calls == ["g"]

    hook0 = C.make_lm_hook(path)  # default: no sampling anywhere
    assert not hook0.sampling
    calls.clear()
    hook0("K=greeting|P=Day|B=2|N=Bo|S=Al|A=1,2|D=|V=0|R=0|Q=hi")
    assert calls == ["g"]


def test_names_intact_guard():
    """The sampled tier's name guard: a decode that wanders mid-name-copy
    ("Vee" -> "Veee") is rejected; exact names and unrelated words sharing
    a prefix pass."""
    ctx = "K=greeting|P=Day|B=2|N=Bo|S=Vee|A=1,2|D=|V=0|R=0|Ns=1:Vee,2:Bo|Q=hi"
    assert C.names_intact("Hey Vee, good to see you!", ctx)
    assert not C.names_intact("Hey Veee!", ctx)       # name + extra chars
    assert not C.names_intact("Hello Veec.", ctx)     # wandered mid-copy
    assert C.names_intact("We veer off course.", ctx)  # unrelated word ok
    assert C.names_intact("No names at all.", ctx)


def test_hook_retries_salts_then_falls_back_on_garbled_names(tiny, tmp_path,
                                                             monkeypatch):
    """A sampled decode that garbles a player name must never ship: the
    hook walks the salt schedule, then yields to greedy."""
    params, cfg = tiny
    path = str(tmp_path / "tiny3.npz")
    C.save(path, params, cfg)
    hook = C.make_lm_hook(path, sample_temp=0.8)
    salts = []

    def bad_sample(*a, **k):
        salts.append(k["salt"])
        return "Hey Veee, friend!"  # always-garbled name

    monkeypatch.setattr(C, "sampled_reply", bad_sample)
    monkeypatch.setattr(C, "greedy_reply", lambda *a, **k: "Hey Vee.")
    out = hook("K=greeting|P=Day|B=2|N=Bo|S=Vee|A=1,2|D=|V=0|R=0"
               "|Ns=1:Vee,2:Bo|Q=hi")
    assert salts == [0, 1, 2] and out == "Hey Vee."


def test_sample_kinds_have_no_factual_payload():
    """The samplable set must stay disjoint from every kind whose reply
    quotes state (the serving-safety contract this module promises)."""
    factual = {"status", "score", "vote", "suspicion", "field",
               "statements", "rules", "history", "advice"}
    assert not (C.SAMPLE_KINDS & factual)
    assert C.SAMPLE_KINDS == {"greeting", "default"}


def test_shipped_checkpoint_sampling_varies_and_stays_wellformed():
    """On the shipped model: greeting replies VARY across the composer's
    per-message variant roll (the R= context segment — serving rolls it
    per message, so this is the mechanism that actually produces variety
    in rooms), every decode is deterministic given its (ctx, salt), and
    outputs obey the same truncation discipline as greedy (complete
    sentences or empty).

    Note: the r4c+ students are converged enough that top-p sampling at
    a FIXED context collapses to greedy (~all mass on the teacher reply);
    per-salt distinctness at one ctx is therefore not asserted — variety
    rides R=, exactly as in the composer tier it distills."""
    if not os.path.exists(_CKPT):
        pytest.skip("no shipped chat LM checkpoint")
    import re

    params, cfg = C.load(_CKPT)
    # an IN-DISTRIBUTION greeting context (held-out corpus seed) — the
    # richer-context students treat the minimal v1 CTX as OOV and emit
    # EOS immediately (template fallback in serving), so sample what
    # lm_context actually produces
    ctx = next(c for c, _ in C.build_corpus(games=("werewolf",),
                                            seeds=range(330, 334),
                                            max_pairs=400)
               if c.startswith("K=greeting|"))
    outs = []
    for roll in range(6):
        c2 = re.sub(r"\|R=\d+", "|R=%d" % roll, ctx)
        s = C.sampled_reply(params, cfg, c2, temperature=0.9, salt=0)
        assert s == C.sampled_reply(params, cfg, c2, temperature=0.9,
                                    salt=0)
        if s:
            assert s[-1] in ".!?\"'" or s[-1].isalnum()
        outs.append(s)
    assert len({o for o in outs if o}) >= 3, outs


def test_chatroom_serves_sampled_greeting(tiny, tmp_path):
    """End to end through ChatRoom: a sampling hook's greeting reply rides
    the lm path and is replay-stable (two rooms, same seed, same reply)."""
    from game_engine_tpu.server.chat import ChatRoom

    params, cfg = tiny
    path = str(tmp_path / "tiny2.npz")
    C.save(path, params, cfg)
    hook = C.make_lm_hook(path, sample_temp=0.8)
    snap = {"player_states": {"1": {"name": "Al", "is_alive": True},
                              "2": {"name": "Bo", "is_alive": True}},
            "current_phase_name": "Day", "deadPlayers": []}
    msgs = []
    for _ in range(2):
        room = ChatRoom("r", seed=9, lm_hook=hook)
        m = room.bot_reply(1, "Al", "hello there", snap)
        assert m is not None and m.message
        msgs.append(m.message)
    assert msgs[0] == msgs[1]
