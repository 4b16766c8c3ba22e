"""Suspicion conditioning segments (r4b residual fix): Am= (did the sender
accuse THIS bot — the composer's template-selection branch) and Dn= (dead
count — the accused-me template says "N of us are already gone", and a
char-level student cannot reliably count the D= id list). Gated on
checkpoints that trained on them (cfg.sus2 -> hook.sus2); older checkpoints
keep byte-identical suspicion contexts."""

import re

from game_engine_tpu.policies import chat_lm as C
from game_engine_tpu.server.chat import ChatRoom, _accused_me


def _snapshot(dead=()):
    players = {
        "1": {"name": "Alba", "is_alive": True},
        "2": {"name": "Boro", "is_alive": True},
        "3": {"name": "Ciri", "is_alive": 3 not in dead},
        "4": {"name": "Dax", "is_alive": 4 not in dead},
    }
    return {"player_states": players, "current_phase_name": "Day",
            "deadPlayers": list(dead)}


def _plan(room, q, snap):
    room.post(1, "Alba", q)
    return room.plan_reply(1, "Alba", q, snap)


def test_accused_me_definitions():
    me = {"name": "Boro"}
    assert _accused_me(me, 2, "I think you are the werewolf")
    assert _accused_me(me, 2, "player 2 is guilty")
    assert _accused_me(me, 2, "Boro is suspicious")
    assert not _accused_me(me, 2, "Ciri looks guilty to me")


def test_old_hooks_keep_byte_identical_suspicion_contexts():
    room = ChatRoom("r", seed=1)  # no hook
    plan = _plan(room, "to Bot 2: you are guilty", _snapshot())
    assert plan["context"].startswith("K=suspicion|")
    assert "|Am=" not in plan["context"] and "|Dn=" not in plan["context"]

    def old(ctx):
        return "x"

    old.grounded = old.kinds2 = True  # even a v2 hook without sus2
    room2 = ChatRoom("r2", seed=1, lm_hook=old)
    plan2 = _plan(room2, "to Bot 2: you are guilty", _snapshot())
    assert "|Am=" not in plan2["context"]


def test_sus2_hook_gets_am_and_dn_segments():
    def new(ctx):
        return "x"

    new.sus2 = True
    room = ChatRoom("r", seed=1, lm_hook=new)
    plan = _plan(room, "to Bot 2: you are guilty", _snapshot(dead=(3, 4)))
    assert "|Am=1|Dn=2" in plan["context"]
    room2 = ChatRoom("r2", seed=1, lm_hook=new)
    plan2 = _plan(room2, "to Bot 2: Ciri is the werewolf", _snapshot())
    assert "|Am=0|Dn=0" in plan2["context"]
    # the segment agrees with the composer's branch: accused-me replies
    # push back at the sender, deflections name a third party
    assert re.search(r"point at me|Where's the proof|not the one|my taste|"
                     r"eye on|fits better|checked", plan["composed"])


def test_sus_segments_only_on_suspicion_kind():
    def new(ctx):
        return "x"

    new.sus2 = True
    room = ChatRoom("r", seed=1, lm_hook=new)
    for q in ("hello there", "what's the score?", "who is still alive?"):
        plan = _plan(room, q, _snapshot())
        assert "|Am=" not in plan["context"], (q, plan["context"])


def test_corpus_suspicion_pairs_carry_the_segments():
    pairs = C.build_corpus(games=("werewolf",), seeds=range(2),
                           max_pairs=2000)
    sus = [c for c, _ in pairs if c.startswith("K=suspicion|")]
    assert sus, "corpus produced no suspicion pairs"
    assert all(re.search(r"\|Am=[01]\|Dn=\d+", c) for c in sus)
    # and the Dn count matches the D= id list it summarizes
    for c in sus:
        d = re.search(r"\|D=([^|]*)", c).group(1)
        dn = int(re.search(r"\|Dn=(\d+)", c).group(1))
        assert dn == (len(d.split(",")) if d else 0), c
