"""External chat-model seam (server/chat_llm.py): free-form persona
roleplay behind any completion function as the TOP responder tier, with
host-side safety — hidden values never enter the prompt, grounded
replies are verified before being trusted, failures fall through to the
built-in tiers, and journal replay reproduces a nondeterministic model's
output verbatim. Reference behavior being generalized: ChatBotNode sends
the full game context to gpt-4.1-mini (agent/game_agent_v2.py:351-466)."""

import re

import pytest

from game_engine_tpu.server import chat_llm as X
from game_engine_tpu.server.manager import GameHost


def _host(game, complete, seed=4, n=4, persist_dir=None):
    host = GameHost(backend="native", chat_complete=complete,
                    persist_dir=persist_dir)
    host.start_room("g", game, n, seed=seed, human_seats=[1])
    host.run_until_input_needed("g")
    return host


def _reply(host, text, bot=2):
    out = host.post_chat("g", 1, f"to Bot {bot}: {text}")
    assert len(out) == 2, out
    return out[1]["message"]


# -- sanitizer ---------------------------------------------------------------


def test_sanitize_collapses_and_strips():
    assert X.sanitize_reply("  Hello\n  there!\n") == "Hello there!"
    assert X.sanitize_reply('"Quoted speech."') == "Quoted speech."
    assert X.sanitize_reply("Bot 2: I speak.") == "I speak."
    assert X.sanitize_reply("```text\nfenced reply\n```") == "fenced reply"
    assert X.sanitize_reply("") == ""
    assert X.sanitize_reply(None) == ""
    assert X.sanitize_reply("   \n\t ") == ""


def test_sanitize_truncates_at_sentence():
    long = ("First sentence here. " * 30).strip()
    out = X.sanitize_reply(long)
    assert len(out) <= X.MAX_REPLY_CHARS
    assert out.endswith(".")


# -- roleplay tier end to end ------------------------------------------------


def test_ext_tier_serves_roleplay_reply():
    """A smalltalk message is answered by the external model's (sanitized)
    output, not the template composer."""
    host = _host("gift-circle",
                 lambda prompt: "Ah, a fine day for gifting!\n")
    assert _reply(host, "lovely weather, eh?") == \
        "Ah, a fine day for gifting!"


def test_prompt_carries_persona_state_and_transcript():
    """The prompt the model sees names the bot, its persona tics, the
    phase, the alive roster, the sender's text, and the chat so far."""
    seen = []

    def complete(prompt):
        seen.append(prompt)
        return "Noted."

    host = _host("gift-circle", complete)
    _reply(host, "first message")
    _reply(host, "second message")
    p = seen[-1]
    assert "You are roleplaying" in p and "Persona:" in p
    assert "Current phase:" in p
    assert "second message" in p
    # the transcript includes the earlier exchange
    assert "first message" in p and "Noted." in p
    assert f"under {X.MAX_REPLY_CHARS} characters" in p


def test_hidden_value_never_in_prompt_and_liar_falls_back():
    """Ask a werewolf bot for its role: the prompt must NOT contain the
    actual role value (withhold, don't trust), must carry the hidden-field
    refusal instruction, and a model reply that leaks a made-up value is
    rejected by the host's refusal check — the guarded template serves."""
    seen = []

    def complete(prompt):
        seen.append(prompt)
        return "I am the Werewolf, fear me!"  # names no field, no refusal

    host = _host("werewolf", complete, n=6)
    role = host.snapshot("g")["player_states"]["2"]["role"]
    reply = _reply(host, "what is your role?")
    prompt = seen[-1]
    assert "HIDDEN information" in prompt and "'role'" in prompt
    assert f"'{role}'" not in prompt  # the value itself is withheld
    # the lying decode was rejected: the served reply is the guarded
    # template (names the field, refuses)
    assert "role" in reply.lower()
    assert reply != "I am the Werewolf, fear me!"


def test_grounded_visible_verified_pass_and_fail():
    """A public-field question: a faithful external reply (quotes the
    exact value, names the field) serves; an unfaithful one falls back to
    the template, which always carries the exact value."""
    host = _host("gift-circle", lambda prompt: "You have a million coins!")
    coins = int(host.snapshot("g")["player_states"]["2"]["coins"])
    reply = _reply(host, "how many coins do you have?")
    assert "million" not in reply
    assert re.search(rf"\b{coins}\b", reply) and "coins" in reply

    def faithful(prompt):
        m = re.search(r"Its actual value is '([^']*)'", prompt)
        return f"Ha! My coins stand at {m.group(1)}, as ever."

    host2 = _host("gift-circle", faithful)
    reply2 = _reply(host2, "how many coins do you have?")
    assert reply2 == f"Ha! My coins stand at {coins}, as ever."


def test_ext_failure_falls_through_to_template():
    def boom(prompt):
        raise RuntimeError("model down")

    host = _host("gift-circle", boom)
    assert _reply(host, "hello!")  # template tier still serves


def test_ext_empty_falls_through_to_template():
    host = _host("gift-circle", lambda prompt: "   \n ")
    assert _reply(host, "hello!")


def test_replay_reproduces_nondeterministic_reply(tmp_path):
    """Bot replies are journaled verbatim: crash-recovery replay
    reproduces the external model's output byte-for-byte WITHOUT
    re-consulting it — a restart with no model (or a different one)
    cannot diverge."""
    calls = []

    def nondet(prompt):
        calls.append(1)
        return f"Reply number {len(calls)}, you see."

    pdir = str(tmp_path / "rooms")
    host = _host("gift-circle", nondet, persist_dir=pdir)
    _reply(host, "say something")
    _reply(host, "say more")
    before = host.chat_messages("g", 1)
    n_calls = len(calls)

    host2 = GameHost(backend="native", persist_dir=pdir)  # NO model
    assert host2.restore_room("g")
    after = host2.chat_messages("g", 1)
    assert [m["message"] for m in after] == [m["message"] for m in before]
    assert len(calls) == n_calls  # replay never re-ran the model


def test_prompt_builder_unit():
    """roleplay_prompt unit: grounded blocks, fallen roster, scoreboard
    and private knowledge render from the plan/snapshot alone."""
    snapshot = {
        "player_states": {
            "1": {"name": "Ada", "is_alive": True, "score": 3},
            "2": {"name": "Bo", "is_alive": True, "score": 5,
                  "vote_choice": 1,
                  "investigated_alignments": {"1": "good"}},
            "3": {"name": "Cy", "is_alive": False, "score": 0},
        },
        "deadPlayers": [3],
        "current_phase_name": "Day Voting",
    }
    plan = {"bot": 2, "bot_name": "Bo", "sender_name": "Ada",
            "text": "thoughts?", "grounded": None}
    p = X.roleplay_prompt(plan, snapshot, [], persona=1,
                          visibility={}, game="testgame")
    assert "Bo" in p and "Day Voting" in p and "testgame" in p
    assert "Out of the game: Cy." in p
    assert "you voted for Ada" in p
    assert "you investigated player 1: good" in p
    g = dict(plan, grounded={"fname": "score", "val": "5",
                             "hidden": False, "subj": "Bo"})
    pg = X.roleplay_prompt(g, snapshot, [], persona=0, visibility={})
    assert "Its actual value is '5'" in pg
    h = dict(plan, grounded={"fname": "role", "val": None,
                             "hidden": True, "subj": "Bo"})
    ph = X.roleplay_prompt(h, snapshot, [], persona=0, visibility={})
    assert "HIDDEN information" in ph and "'role'" in ph


def test_ext_tier_outranks_learned_lm(tmp_path):
    """With BOTH an external model and a learned checkpoint configured,
    the external tier answers first; when it returns nothing the learned
    tier takes over (not the template)."""
    import jax

    from game_engine_tpu.policies import chat_lm as C

    cfg = C.LMConfig(d_model=32, n_layers=1, n_heads=2, max_len=96)
    params = C.init_params(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "tiny.npz")
    C.save(path, params, cfg)

    host = GameHost(backend="native", chat_lm=path,
                    chat_complete=lambda prompt: "External says hi.")
    host.start_room("g", "gift-circle", 4, seed=4, human_seats=[1])
    host.run_until_input_needed("g")
    assert _reply(host, "hello!") == "External says hi."
