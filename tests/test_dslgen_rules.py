"""Rule-sentence mining -> declared P20 effect programs (dslgen/rules.py).

The reference synthesizes arbitrary described mechanics via its LLM dsl
agent (reference: agent/dsl_agent.py:157-371); the deterministic generator
compiles a bounded grammar of house-rule sentences straight to effect-IR
programs on the archetype's round loop. Pinned here:

  * the sentence families parse (digits and number words, dedupe) — four
    v1 families here, four v2 families (transfer, protection, vote_weight,
    one_shot) in tests/test_vote_mods.py;
  * injected games validate, compile, and run to termination in the
    oracle with the rule's effect visible in player state;
  * oracle <-> engine bit-parity holds for an injected game (the program
    rides the same P20 interpreter as hand-written YAML);
  * kill rules are skipped loudly on archetypes without is_alive;
  * unconditional gains that duplicate archetype income are skipped
    (double-pay guard);
  * no catalog game description matches the miner EXCEPT the explicit
    RULE_MINED_CATALOG witnesses pinned to generator output (documented
    rule at the guard);
  * mined sentences count as consumed in description_coverage.
"""

import glob
import os

import yaml

from game_engine_tpu.dslgen import rules as RU
from game_engine_tpu.dslgen.generate import (
    description_coverage,
    generate_from_description,
)
from game_engine_tpu.dslgen.validate import errors, validate_doc
from game_engine_tpu.gamespec.compile import compile_game
from game_engine_tpu.gamespec.parser import games_dir, parse_game_spec
from game_engine_tpu.gamespec.tables import lower
from game_engine_tpu.oracle.interp import OracleRoom
from game_engine_tpu.policies.scripted import oracle_policy
from tests.test_mix import _run_oracle_vs_engine

ROUNDS_DESC = (
    "A haunted manor party game where guests tell stories each round and "
    "vote on the best tale. Every round, each player gains 1 curse. "
    "Each round, every player with fewer than three charms collects 1 "
    "charm. Every round, the richest player loses 1 charm."
)
ELIM_DESC = (
    "A werewolf village where wolves hunt at night and the town votes at "
    "dawn. Every round, each player gains 1 curse. Anyone who reaches 5 "
    "or more curses is eliminated."
)


def test_mine_rules_families():
    rules = RU.mine_rules(ROUNDS_DESC + " " + ELIM_DESC)
    kinds = [(r.kind, r.noun, r.amount, r.threshold) for r in rules]
    assert ("gain", "curse", 1, None) in kinds
    assert ("catchup", "charm", 1, 3) in kinds
    assert ("leader_tax", "charm", 1, None) in kinds
    assert ("threshold_kill", "curses", 5, None) in kinds
    # duplicate sentences dedupe to one rule
    assert len(RU.mine_rules(ELIM_DESC + " " + ELIM_DESC)) == 2


def test_mine_number_words_and_trailing_tax():
    rules = RU.mine_rules(
        "Every round, each player gains a dozen gems. The leading player "
        "pays two gems each turn.")
    assert [(r.kind, r.amount) for r in rules] == [
        ("gain", 12), ("leader_tax", 2)]


def test_inject_rounds_full_run():
    report: list[str] = []
    doc = generate_from_description("haunted-manor", ROUNDS_DESC,
                                    report=report)
    progs = [h for ph in doc["phases"].values()
             for h in ph.get("mechanics", [])
             if isinstance(h, dict) and "effects" in h]
    assert len(progs) == 1
    assert progs[0]["effects"] == [
        "curses += 1 where alive",
        "charms += 1 where alive and charms < 3",
        "charms -= 1 where alive and seat == argmax(charms, alive)",
    ]
    # synthesized fields declared with template defaults
    decl = doc["declaration"]
    assert decl["player_states"]["curses"]["type"] == "num"
    assert decl["player_states_template"]["player_states"]["1"]["charms"] == 0
    issues, _ = validate_doc(doc, "haunted-manor")
    assert not errors(issues)
    lowered = lower(compile_game(parse_game_spec(doc, "haunted-manor")))
    room = OracleRoom(lowered.game, n_players=5, seed=3)
    for t in range(600):
        room.step(oracle_policy(room, t, 3))
        if room.done:
            break
    assert room.done
    curses = [room.players[p]["curses"] for p in range(1, 6)]
    charms = [room.players[p]["charms"] for p in range(1, 6)]
    assert all(c > 0 for c in curses)          # the gain rule fired
    assert all(0 <= c <= 3 for c in charms)    # catchup capped at the bound
    assert min(charms) < max(charms)           # leader tax bit someone


def test_inject_elimination_kill_and_parity():
    report: list[str] = []
    doc = generate_from_description("cursed-village", ELIM_DESC,
                                    report=report)
    progs = [h for ph in doc["phases"].values()
             for h in ph.get("mechanics", [])
             if isinstance(h, dict) and "effects" in h]
    assert progs == [{"effects": [
        "curses += 1 where alive", "---", "kill where curses >= 5"]}]
    issues, _ = validate_doc(doc, "cursed-village")
    assert not errors(issues)
    lowered = lower(compile_game(parse_game_spec(doc, "cursed-village")))
    # oracle <-> XLA engine bit-parity on the injected program
    room = _run_oracle_vs_engine(lowered, 6, 1)
    assert room.phase.dsl_id == 99


def test_kill_skipped_without_alive():
    report: list[str] = []
    doc = generate_from_description(
        "story-curse",
        "Guests tell stories each round and vote on the best tale. Anyone "
        "who reaches 3 or more curses is eliminated.",
        report=report)
    assert any("needs player elimination" in n for n in report)
    assert not any(isinstance(h, dict) and "effects" in h
                   for ph in doc["phases"].values()
                   for h in ph.get("mechanics", []))


def test_double_pay_guard():
    report: list[str] = []
    generate_from_description(
        "bazaar",
        "A trading bazaar where merchants haggle and trade coins at the "
        "market; every round, each player collects 1 coin. First to "
        "twelve coins wins.",
        report=report)
    assert any("double-pay guard" in n for n in report)


# THE RULE (documented per VERDICT r4 item 1): a catalog game whose
# description triggers the rule miner is allowed ONLY when it is pinned to
# `generate_from_description` output by an explicit equality test below —
# then any grammar change that alters the emission breaks the pin LOUDLY
# instead of silently drifting the served copy away from the generator.
# Everything else in games/ must not match the miner at all.
RULE_MINED_CATALOG = {"shield-wall.yaml"}

SHIELD_WALL_DESC = (
    "A last-one-standing elimination battle: discuss, vote someone out "
    "every round, survive to the end. At the start of the game, each "
    "player receives 5 coins. Every round, the richest player gives 1 "
    "coin to the poorest player. Players with 8 or more coins cannot be "
    "eliminated. The vote of a player with 6 or more coins counts double.")


def test_catalog_descriptions_do_not_match():
    """Byte-pinned generator outputs must stay byte-identical: no catalog
    game's description may trigger rule injection — except the explicit
    RULE_MINED_CATALOG witnesses, each pinned to generator output by its
    own test (see the documented rule above)."""
    hits = {}
    for path in sorted(glob.glob(os.path.join(games_dir(), "*.yaml"))):
        if os.path.basename(path) in RULE_MINED_CATALOG:
            continue
        with open(path) as f:
            doc = yaml.safe_load(f)
        desc = (doc.get("declaration") or {}).get("description") or ""
        mined = RU.mine_rules(desc)
        if mined:
            hits[os.path.basename(path)] = [r.text for r in mined]
    assert not hits, hits


def test_shield_wall_catalog_copy_is_generator_output():
    """games/shield-wall.yaml witnesses the round-5 rule families
    (one_shot, transfer, protection, vote_weight) — generator output for
    its own description, zero warnings (the RULE_MINED_CATALOG pin)."""
    rep: list = []
    doc = generate_from_description("shield-wall", SHIELD_WALL_DESC,
                                    report=rep)
    assert not [w for w in rep if w.startswith("WARNING")], rep
    with open(os.path.join(games_dir(), "shield-wall.yaml")) as f:
        on_disk = yaml.safe_load(f)
    assert on_disk == doc


def test_rule_mined_catalog_files_exist():
    for fn in RULE_MINED_CATALOG:
        assert os.path.exists(os.path.join(games_dir(), fn)), fn


def test_coverage_counts_rule_sentences():
    cov = description_coverage(ELIM_DESC)
    assert "curses" not in cov["unconsumed"]
    assert "eliminated" not in cov["unconsumed"]
    assert "reaches" not in cov["unconsumed"]
