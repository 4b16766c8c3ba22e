"""DSL generation + validation: shipped games validate clean; generated
games validate, compile, and run end-to-end with oracle/engine parity."""

import numpy as np
import pytest

from game_engine_tpu.core.engine import BatchedEngine, scripted_actions
from game_engine_tpu.core.state import init_state
from game_engine_tpu.dslgen.generate import Blueprint, generate, generate_from_description
from game_engine_tpu.dslgen.validate import errors, validate_doc, validate_spec
from game_engine_tpu.gamespec.compile import compile_game
from game_engine_tpu.gamespec.parser import parse_game_spec
from game_engine_tpu.gamespec.tables import lower
from game_engine_tpu.oracle.interp import OracleRoom
from game_engine_tpu.policies.scripted import oracle_policy
from tests.test_parity import assert_state_matches


def test_shipped_games_validate(werewolf_spec, twotruths_spec):
    for spec in (werewolf_spec, twotruths_spec):
        issues = validate_spec(spec)
        assert not errors(issues), [str(i) for i in errors(issues)]


def test_validator_catches_structural_errors():
    bad = {
        "declaration": {"player_states": {}},
        "phases": {
            "1": {"name": "Orphan", "next_phase": {"id": 2, "name": "Loop"}},
            "2": {"name": "Loop", "next_phase": {"id": 1, "name": "Orphan"}},
        },
    }
    issues, spec = validate_doc(bad)
    msgs = " | ".join(str(i) for i in issues)
    assert "phase 0" in msgs
    assert "no terminal phase" in msgs
    assert "cannot reach any terminal" in msgs


def test_validator_flags_bad_predicates():
    doc = {
        "declaration": {
            "player_states": {"is_alive": {"type": "boolean"}},
            "audience_groups": {
                "broken": {"selection_criteria": "player.x ==  "},
            },
        },
        "phases": {
            0: {"name": "Intro", "actions": [{"description": "clear", "tools": ["clearCanvas"]}],
                "completion_criteria": {"type": "UI_displayed"}, "next_phase": {"id": 99, "name": "End"}},
            99: {"name": "End", "actions": [{"description": "clear", "tools": ["clearCanvas"]}],
                 "completion_criteria": {"type": "UI_displayed"}, "next_phase": None},
        },
    }
    issues, _ = validate_doc(doc)
    assert any("selection_criteria" in str(i) for i in errors(issues))


def test_battle_archetype_survivor_parity():
    """Last-survivor voting: survivor winner mode across oracle/engine/C++."""
    doc = generate_from_description(
        "royale", "A battle royale where players vote each other out; last one standing wins."
    )
    spec = parse_game_spec(doc, name="royale")
    issues, _ = validate_doc(doc, name="royale")
    assert not errors(issues), [str(i) for i in errors(issues)]
    lowered = lower(compile_game(spec))
    go = next(iter(lowered.game_overs))
    assert go.mode == "survivor"
    eng = BatchedEngine(lowered)
    for seed in (0, 5):
        room = OracleRoom(lowered.game, n_players=5, seed=seed)
        state = init_state(lowered, 1, 5, np.uint32(seed))
        for t in range(200):
            room.step(oracle_policy(room, t, seed))
            state = eng.step(state, scripted_actions(lowered, state))
            assert_state_matches(lowered, room, state, 0, t)
            if room.done:
                break
        assert room.done
        alive = [p for p in range(1, 6) if room.players[p]["is_alive"]]
        assert len(alive) == 1 and room.winner == alive[0]
    # native executor agrees too
    from game_engine_tpu.native import available

    if available():
        from tests.test_native import run_differential

        run_differential(lowered, n_players=5, seed=2, max_steps=200)


@pytest.mark.parametrize("archetype", ["elimination", "rounds", "battle"])
def test_generated_game_validates_and_compiles(archetype):
    doc = generate(Blueprint(name=f"gen-{archetype}", description="x", archetype=archetype))
    issues, spec = validate_doc(doc, name=f"gen-{archetype}")
    assert spec is not None
    assert not errors(issues), [str(i) for i in errors(issues)]
    compile_game(spec)


def test_generated_elimination_runs_with_parity():
    doc = generate_from_description(
        "assassins", "A hidden-role night elimination deduction game with assassins."
    )
    spec = parse_game_spec(doc, name="assassins")
    lowered = lower(compile_game(spec))
    eng = BatchedEngine(lowered)
    for seed in (0, 3):
        room = OracleRoom(lowered.game, n_players=5, seed=seed)
        state = init_state(lowered, 1, 5, np.uint32(seed))
        for t in range(300):
            room.step(oracle_policy(room, t, seed))
            state = eng.step(state, scripted_actions(lowered, state))
            assert_state_matches(lowered, room, state, 0, t)
            if room.done:
                break
        assert room.done
        roles = room.field_values("role")
        assert roles.count("Assassin") == 1
        assert room.winner in (1, 2)


def test_generated_rounds_runs_to_completion():
    doc = generate_from_description("storytime", "A turn-based storytelling guessing party game.")
    spec = parse_game_spec(doc, name="storytime")
    lowered = lower(compile_game(spec))
    room = OracleRoom(lowered.game, n_players=4, seed=1)
    for t in range(300):
        room.step(oracle_policy(room, t, 1))
        if room.done:
            break
    assert room.done
    assert all(r == 1 for r in room.field_values("rounds_as_speaker"))


def test_description_mining_builds_custom_casts():
    """generate_from_description mines role names, killer counts and table
    size from free text (round 2: beyond fixed-archetype keywords)."""
    from game_engine_tpu.dslgen.generate import generate_from_description
    from game_engine_tpu.dslgen.validate import errors, validate_doc

    doc = generate_from_description(
        "mined", "a mafia game with a sheriff and a bodyguard, 6 players")
    issues, spec = validate_doc(doc, name="mined")
    assert spec is not None and not errors(issues) and not issues
    names = [r["name"] for r in doc["declaration"]["roles"]]
    assert {"Mafia", "Sheriff", "Bodyguard"} <= set(names)
    assert doc["declaration"]["min_players"] == 6

    doc = generate_from_description(
        "vamp", "two vampires stalk the citizens at night; a psychic investigates")
    names = [r["name"] for r in doc["declaration"]["roles"]]
    # the declaration lists each distinct role ONCE; the mined cast size
    # (two vampires) lives in players_example rows (a duplicated
    # declaration entry used to double-count into all-killer tables)
    assert names.count("Vampire") == 1 and "Psychic" in names
    example_roles = [row["role"] for row in
                     doc["declaration"]["players_example"]["player_states"].values()]
    assert example_roles.count("Vampire") == 2
    issues, spec = validate_doc(doc, name="vamp")
    assert spec is not None and not errors(issues)
    from game_engine_tpu.gamespec import mechanics as M
    from game_engine_tpu.gamespec.layout import build_layout
    from game_engine_tpu.gamespec.mechanics import role_multiset
    progs = M.analyze(spec, build_layout(spec.declaration))
    ra = next(m for pp in progs.values() for m in pp.on_enter
              if isinstance(m, M.RoleAssign))
    assert role_multiset(ra, 6).count("Vampire") == 2
    # the mined game runs to termination with oracle semantics
    from game_engine_tpu.gamespec.compile import compile_game
    from game_engine_tpu.gamespec.tables import lower
    from game_engine_tpu.oracle.interp import OracleRoom
    from game_engine_tpu.policies.scripted import oracle_policy

    lowered = lower(compile_game(spec))
    room = OracleRoom(lowered.game, n_players=6, seed=2)
    for t in range(400):
        room.step(oracle_policy(room, t, 2))
        if room.done:
            break
    assert room.done


@pytest.mark.parametrize("name", ["bluff-court", "market-raid",
                                   "odd-one-out", "last-stand"])
def test_catalog_games_match_generator(name):
    """Every generator-produced catalog game is byte-pinned to
    generate_from_description on its own declaration description — catalog
    copies (and their P18 self-annotations) cannot drift."""
    import os

    import yaml

    from game_engine_tpu.gamespec.parser import games_dir

    path = os.path.join(games_dir(), f"{name}.yaml")
    on_disk = yaml.safe_load(open(path))
    desc = on_disk["declaration"]["description"]
    assert on_disk == generate_from_description(name, desc)
    assert any(p.get("mechanics") for p in on_disk["phases"].values())


# ---------------------------------------------------------------------------
# conversion archetype (round 4): recruitment via the IR's string-write
# surface — team flips are vocab-coded SSet statements the generator now
# emits directly (reference equivalent: free update_player_state writes,
# agent/tools/backend_tools.py:204-225)
# ---------------------------------------------------------------------------

_CULT_DESC = (
    "A hidden prophet leads a secret cult among seven villagers. Each "
    "night the cult recruits one villager into the fold; each day the "
    "village votes to banish a suspect. The cult wins when every "
    "living player has been converted."
)


def test_conversion_archetype_selected_over_night_words():
    """'recruits ... each night' must pick conversion, not elimination —
    the convert vocabulary outranks the night vocabulary."""
    doc = generate_from_description("shadow-fold", _CULT_DESC)
    names = {ph["name"] for ph in doc["phases"].values()}
    assert "Dawn" in names and "Banishment" in names
    roles = {r["name"] for r in doc["declaration"]["roles"]}
    assert roles == {"Prophet", "Villager"}
    # the conversion program is a declared effects: mechanic
    dawn = next(p for p in doc["phases"].values() if p["name"] == "Dawn")
    stmts = dawn["mechanics"][0]["effects"]
    assert any("team = 'cult'" in s for s in stmts)


def test_generated_conversion_validates_and_both_teams_win():
    doc = generate_from_description("shadow-fold", _CULT_DESC)
    issues, spec = validate_doc(doc, name="shadow-fold")
    assert spec is not None
    assert not errors(issues), [str(i) for i in errors(issues)]
    game = compile_game(spec)
    winners = set()
    saw_conversion = saw_mark = False
    for seed in range(60):
        room = OracleRoom(game, n_players=6, seed=seed)
        for t in range(2000):
            room.step(oracle_policy(room, t, seed))
            if room.done:
                break
        assert room.done, f"seed {seed} never terminated"
        winners.add(room.winner)
        for p in room.players.values():
            if p.get("role") == "Villager" and p.get("team") == "cult":
                saw_conversion = True
            if any(v == "claimed" for v in (p.get("marks") or {}).values()):
                saw_mark = True
        if winners == {1, 2} and saw_conversion and saw_mark:
            break
    assert saw_conversion, "no Villager was ever converted"
    assert saw_mark, "no marks entry was ever written"
    assert winners == {1, 2}, f"only teams {winners} ever won"


def test_generated_conversion_engine_parity():
    doc = generate_from_description("shadow-fold", _CULT_DESC)
    spec = parse_game_spec(doc, name="shadow-fold")
    lowered = lower(compile_game(spec))
    eng = BatchedEngine(lowered)
    for seed in (0, 3):
        room = OracleRoom(lowered.game, n_players=6, seed=seed)
        state = init_state(lowered, 1, 6, np.uint32(seed))
        for t in range(600):
            room.step(oracle_policy(room, t, seed))
            state = eng.step(state, scripted_actions(lowered, state))
            assert_state_matches(lowered, room, state, 0, t)
            if room.done:
                break
        assert room.done


def test_conversion_leader_name_mined():
    doc = generate_from_description(
        "hive", "A hive queen secretly assimilates crewmates each night; "
                "the crew votes to banish a suspect each day.")
    roles = {r["name"] for r in doc["declaration"]["roles"]}
    assert "Hive queen" in roles, roles
    assert "Crewmate" in roles or "Crew" in roles, roles


# ---------------------------------------------------------------------------
# pressluck archetype (round 4): press-your-luck banking via the IR's
# conditional `reset` statement (tide-pool's bust rule as a generator family)
# ---------------------------------------------------------------------------

_HOARD_DESC = (
    "Gamblers press their luck at the dragon's hoard: each round grow a "
    "risky stash or bank it as treasure before a bust sweeps it away. "
    "First to ten banked treasures wins."
)


def test_pressluck_archetype_selected_over_market_words():
    """Banking/bust vocabulary must pick pressluck, not market, even though
    'treasure' is an economy word."""
    doc = generate_from_description("dragon-hoard", _HOARD_DESC)
    names = {ph["name"] for ph in doc["phases"].values()}
    assert "Bust Resolution" in names
    resolution = next(p for p in doc["phases"].values()
                      if p["name"] == "Bust Resolution")
    stmts = resolution["mechanics"][0]["effects"]
    assert any(s.startswith("reset stash") for s in stmts)


def test_generated_pressluck_runs_with_busts_and_parity():
    doc = generate_from_description("dragon-hoard", _HOARD_DESC)
    issues, spec = validate_doc(doc, name="dragon-hoard")
    assert spec is not None
    assert not errors(issues), [str(i) for i in errors(issues)]
    lowered = lower(compile_game(spec))
    eng = BatchedEngine(lowered)
    busted = False
    for seed in (0, 2):
        room = OracleRoom(lowered.game, n_players=4, seed=seed)
        state = init_state(lowered, 1, 4, np.uint32(seed))
        prev = None
        for t in range(600):
            room.step(oracle_policy(room, t, seed))
            state = eng.step(state, scripted_actions(lowered, state))
            assert_state_matches(lowered, room, state, 0, t)
            if prev:
                for p, st in room.players.items():
                    if (prev[p]["stash"] > 0 and st["stash"] == 0
                            and st["points"] == prev[p]["points"]):
                        busted = True
            prev = {p: dict(st) for p, st in room.players.items()}
            if room.done:
                break
        assert room.done
    assert busted, "no stash ever busted"


# ---------------------------------------------------------------------------
# racing + draft archetypes (round 4): with these, every IR-only catalog
# family (transfers, reciprocity, racing, draft, press-your-luck,
# conversion) has a generator archetype
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("name,desc,phase,field", [
    ("moon-rally",
     "Rovers race across the lunar track picking secret speeds; matched "
     "speeds collide and stall. First across the finish line wins.",
     "Movement Resolution", "position"),
    ("relic-rush",
     "Collectors draft relics from a shared shrinking pool; contested "
     "claims go to the lowest seat. Richest collection wins.",
     "Claim Resolution", "gold"),
])
def test_racing_and_draft_archetypes(name, desc, phase, field):
    doc = generate_from_description(name, desc)
    names = {p["name"] for p in doc["phases"].values()}
    assert phase in names, names
    issues, spec = validate_doc(doc, name=name)
    assert spec is not None
    assert not errors(issues), [str(i) for i in errors(issues)]
    lowered = lower(compile_game(spec))
    eng = BatchedEngine(lowered)
    winners = set()
    for seed in (0, 4):
        room = OracleRoom(lowered.game, n_players=4, seed=seed)
        state = init_state(lowered, 1, 4, np.uint32(seed))
        for t in range(600):
            room.step(oracle_policy(room, t, seed))
            state = eng.step(state, scripted_actions(lowered, state))
            assert_state_matches(lowered, room, state, 0, t)
            if room.done:
                break
        assert room.done
        winners.add(room.winner)
        assert max(room.field_values(field)) > 0
    assert winners  # someone won in every run


# ---------------------------------------------------------------------------
# masquerade archetype (round 4): identity rotation via the IR's `deal`
# statement with a live salt — a fresh mask permutation every round, the
# mid-game re-deal the retired bespoke role-assign kernel could not express
# ---------------------------------------------------------------------------

_GALA_DESC = (
    "Guests at a midnight masquerade are dealt a fresh mask every round "
    "from the Serpent, Sparrow and Thorn masks; quiet sippers and bold "
    "toasters earn coins by what the masks allow. First to twelve coins "
    "wins the gala."
)


def test_masquerade_archetype_mines_mask_names():
    from game_engine_tpu.dslgen.generate import _mine_mask_names

    assert _mine_mask_names(_GALA_DESC) == ("Serpent", "Sparrow", "Thorn")
    assert _mine_mask_names("a plain masked ball") == ("Fox", "Owl", "Crane")
    doc = generate_from_description("velvet-gala", _GALA_DESC)
    reveal = next(p for p in doc["phases"].values()
                  if p["name"] == "Masked Reveal")
    stmts = reveal["mechanics"][0]["effects"]
    assert stmts[0] == "deal mask salt rounds"
    # the mined mask names parameterize the scoring rules
    assert any("'Serpent'" in s for s in stmts)
    assert any("'Thorn'" in s for s in stmts)


def test_generated_masquerade_redeal_runs_with_parity():
    doc = generate_from_description("velvet-gala", _GALA_DESC)
    issues, spec = validate_doc(doc, name="velvet-gala")
    assert spec is not None
    assert not errors(issues), [str(i) for i in errors(issues)]
    lowered = lower(compile_game(spec))
    eng = BatchedEngine(lowered)
    for seed in (0, 3):
        room = OracleRoom(lowered.game, n_players=5, seed=seed)
        state = init_state(lowered, 1, 5, np.uint32(seed))
        perms, prev = set(), 0
        for t in range(900):
            room.step(oracle_policy(room, t, seed))
            state = eng.step(state, scripted_actions(lowered, state))
            assert_state_matches(lowered, room, state, 0, t)
            r0 = room.players[1].get("rounds")
            if r0 != prev:
                perms.add(tuple(room.players[p]["mask"]
                                for p in range(1, 6)))
                prev = r0
            if room.done:
                break
        assert room.done
        assert len(perms) > 1, "the deal never re-dealt"
        # every deal is the 5-seat multiset: 1 rare, 1 trap, 3 common
        for pm in perms:
            assert sorted(pm) == ["Serpent", "Sparrow", "Sparrow",
                                  "Sparrow", "Thorn"]


def test_masquerade_mines_win_target_and_covers_description():
    from game_engine_tpu.dslgen.generate import (
        _mine_first_to, description_coverage, COVERAGE_WARN_THRESHOLD)

    assert _mine_first_to("first to 20 trophies", 12) == 20
    assert _mine_first_to("first guest to seven coins wins", 12) == 7
    assert _mine_first_to("no target here", 12) == 12
    doc = generate_from_description(
        "quick-gala", "A masked ball; first to 9 coins wins.")
    assert "If any player has 9 or more coins" in doc["phases"][2]["next_phase"]
    # the full gala description is understood well enough not to warn
    cov = description_coverage(_GALA_DESC)
    assert cov["score"] >= COVERAGE_WARN_THRESHOLD, cov["unconsumed"]


def test_out_of_vocab_condition_literal_warns():
    """A string literal no mined vocab can hold makes the comparison
    constant in every executor — the validator must say so loudly."""
    from game_engine_tpu.dslgen.validate import validate_doc

    doc = {
        "declaration": {
            "min_players": 2,
            "player_states": {
                "role": {"type": "string", "example": "Seer"},
                "is_alive": {"type": "boolean", "example": True},
            },
            "roles": [{"name": "Seer"}, {"name": "Wolf"}],
        },
        "phases": {
            0: {"name": "Intro", "next_phase": {"id": 1, "name": "Pick"}},
            1: {"name": "Pick",
                "completion_criteria": {
                    "type": "player_action", "wait_for": "all_alive",
                    "target_players": {"condition": "player.role == 'warlock'"}},
                "next_phase": None},
        },
    }
    issues, spec = validate_doc(doc, name="oov")
    assert spec is not None
    hits = [i for i in issues if "'warlock'" in i.message and "mined vocabulary" in i.message]
    assert hits and hits[0].severity == "warning"
    # an in-vocab literal (any casing) raises no vocab issue
    doc["phases"][1]["completion_criteria"]["target_players"]["condition"] = \
        "player.role == 'WOLF'"
    issues2, _ = validate_doc(doc, name="oov2")
    assert not [i for i in issues2 if "mined vocabulary" in i.message]


def test_unregistered_multi_extras_rejected():
    """Two extras compose only through a registered STACK (canonical
    composition per base; tests/test_mix_stack.py covers the positive
    cases) — naive sequential weaving can silently collide, so anything
    unregistered stays loud, not a dropped terminal edge."""
    with pytest.raises(ValueError, match="no stacked mix"):
        generate(Blueprint("g", "stacked", "bluff",
                           extras=("market", "auction")))


def test_first_to_threshold_mined_across_archetypes():
    """A described 'first to N' victory target parameterizes every
    archetype that declares one — not just masquerade (round-4 fix:
    'first to 20 coins' must not generate a 10-coin market)."""
    cases = [
        ("first to 20 coins", "traders collect coins from the market and "
         "raid rivals; first to 20 coins wins", "20 or more coins"),
        ("number words", "pick a door and blend in with the smallest "
         "group; first to nine points wins", "9 or more points"),
        ("racing track", "racers sprint down the track; first to fifteen "
         "wins the race", "15 or more position"),
        ("gifting", "gift a coin to a friend each round; first to sixteen "
         "coins wins", "16 or more coins"),
    ]
    for label, desc, want in cases:
        doc = generate_from_description("ft", desc)
        branches = [k for ph in doc["phases"].values()
                    if isinstance(ph.get("next_phase"), dict)
                    for k in ph["next_phase"]]
        assert any(want in k for k in branches), (label, branches)
    # clamp: a mined 1 would end on the first score — floor at 2
    from game_engine_tpu.dslgen.generate import _mine_first_to
    assert _mine_first_to("first to 1 coin wins", 10) == 2
    assert _mine_first_to("no target here", 10) == 10


def test_described_counts_mined_into_archetypes():
    """Door/prize counts and per-round income honor the description:
    '5 doors' is a 5-option minority game, 'four relics' a 4-prize draft,
    'collect 2 coins' a 2-coin income — each re-attaching through the
    analyzer (the income sentence mirrors its P12 verb+amount shape)."""
    from game_engine_tpu.gamespec import mechanics as M

    doc = generate_from_description(
        "d5", "pick one of 5 doors in secret; the smallest group scores")
    assert "(1-5)" in doc["phases"][1]["description"] or \
           "1-5" in str(doc["phases"][1])
    doc = generate_from_description(
        "r4", "collectors draft from a shared pool of four relics")
    ps = doc["declaration"]["player_states"]
    assert "has4" in ps and "has5" not in ps
    doc = generate_from_description(
        "m2", "traders collect 2 coins each round at the market "
              "and raid rivals")
    spec = parse_game_spec(doc, name="m2")
    g = compile_game(spec)
    inc = [m for pp in g.phases for m in pp.program.on_enter
           if isinstance(m, M.ResourceIncome)]
    assert inc and dict(inc[0].gains)["coins"] == 2


def test_bluff_court_and_bust_limit_mined():
    """A 3-name proper-noun list with a roles/cards suffix becomes the
    bluff court; 'busting past 8' sets the press-your-luck stash ceiling.
    A bare capitalized list (player names) must NOT replace the court."""
    doc = generate_from_description(
        "court", "a bluffing game where you claim the Duke, Captain or "
                 "Inquisitor cards and challenge suspected liars")
    assert [r["name"] for r in doc["declaration"]["roles"]] == \
        ["Duke", "Captain", "Inquisitor"]
    doc = generate_from_description(
        "plain", "Alice, Bob and Carol play a bluffing game of claims "
                 "and challenges")
    assert [r["name"] for r in doc["declaration"]["roles"]] == \
        ["Duke", "Assassin", "Contessa"]
    doc = generate_from_description(
        "bust8", "press your luck and bank the stash before busting past 8")
    assert "past 8" in doc["declaration"]["player_states"]["stash"]["description"]


def test_round_cap_mined():
    """'for ten rounds' / 'after 8 rounds' sets the archetype's round cap;
    'each round' (no count) must not mis-mine."""
    from game_engine_tpu.dslgen.generate import _mine_rounds
    doc = generate_from_description(
        "g10", "gift a coin to a friend each round for ten rounds")
    branches = [k for ph in doc["phases"].values()
                if isinstance(ph.get("next_phase"), dict)
                for k in ph["next_phase"]]
    assert any("10 or more rounds" in k for k in branches), branches
    assert _mine_rounds("collect 2 coins each round", 60) == 60
    assert _mine_rounds("best of 5 rounds", 60) == 5


EMBER_RUN_DESC = ("Press your luck: stash points each round and bank the "
                  "stash before busting past 8. First to 15 banked points "
                  "wins; the run caps at 50 rounds.")


def test_ember_run_catalog_copy_is_generator_output():
    """games/ember-run.yaml witnesses the round-4 parameter miners (win
    target 15, bust ceiling 8, round cap 50) — byte-exact generator
    output for its own description, zero warnings."""
    import os

    import yaml

    from game_engine_tpu.gamespec.parser import games_dir

    rep: list = []
    doc = generate_from_description("ember-run", EMBER_RUN_DESC, report=rep)
    assert not rep, rep
    with open(os.path.join(games_dir(), "ember-run.yaml"), encoding="utf-8") as f:
        on_disk = yaml.safe_load(f)
    assert on_disk == doc
    ps = doc["declaration"]["player_states"]
    assert "15" in ps["points"]["description"]
    assert "past 8" in ps["stash"]["description"]
    assert "50" in ps["rounds"]["description"]
