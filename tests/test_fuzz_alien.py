"""Out-of-vocabulary fuzz corpus: alien DSLs the blueprint generator never
produces.

The round-1 fuzzer only mutated blueprint output, so oracle and engine could
share the same silently-wrong analysis of unfamiliar vocabulary. This corpus
enforces the loud-or-correct contract (VERDICT r1 item 4): every document
either (a) fails validation with errors, (b) draws at least one validator
warning (the loud path — e.g. a vote phase whose choices no mechanic
consumes), or (c) validates clean and then MUST run to termination in the
oracle with engine parity."""

import numpy as np
import pytest

from game_engine_tpu.core.engine import BatchedEngine, scripted_actions
from game_engine_tpu.core.state import init_state
from game_engine_tpu.dslgen.validate import errors, validate_doc
from game_engine_tpu.gamespec.compile import compile_game
from game_engine_tpu.gamespec.tables import lower
from game_engine_tpu.oracle.interp import OracleRoom
from game_engine_tpu.policies.scripted import oracle_policy
from tests.test_parity import assert_state_matches


def _run_contract(doc, name, seed=3, max_steps=400):
    """Assert the loud-or-correct contract for one document."""
    issues, spec = validate_doc(doc, name=name)
    if errors(issues) or spec is None:
        return "rejected", issues
    if issues:  # warnings: the silent-gap detectors spoke up
        return "warned", issues
    lowered = lower(compile_game(spec))
    n = min(lowered.P, max(spec.declaration.min_players, 4))
    room = OracleRoom(lowered.game, n_players=n, seed=seed)
    eng = BatchedEngine(lowered)
    state = init_state(lowered, 1, n, np.uint32(seed))
    for t in range(max_steps):
        room.step(oracle_policy(room, t, seed))
        state = eng.step(state, scripted_actions(lowered, state))
        assert_state_matches(lowered, room, state, 0, t)
        if room.done:
            break
    assert room.done, (
        f"{name}: validated clean but did not terminate "
        f"(stuck at phase {room.phase.dsl_id}) — a silent semantic gap"
    )
    return "ran", issues


# ---------------------------------------------------------------------------
# Hand-written alien DSLs
# ---------------------------------------------------------------------------


def _council_doc(elim_verb="eliminated", vote_verb="eliminate",
                 resolve_name="Expulsion Resolution"):
    """A minimal hand-written council game (not blueprint-generated):
    discussion -> vote -> resolution -> win check, looping until one
    member remains."""
    return {
        "declaration": {
            "description": "A council votes members out until one remains.",
            "is_multiplayer": True,
            "min_players": 4,
            "roles": [{"name": "Member", "description": "A council member."}],
            "player_states": {
                "name": {"type": "string", "example": "A",
                         "description": "Display name."},
                "is_alive": {"type": "boolean", "example": True,
                             "description": "Still on the council."},
            },
            "player_states_template": {
                "player_states": {"1": {"name": "", "is_alive": True}}
            },
            "audience_groups": [],
        },
        "phases": {
            0: {
                "name": "Game Introduction",
                "description": "Introduce the council and its rules.",
                "actions": [{"description": "TIER 1: show rules",
                             "tools": ["clearCanvas", "createTextDisplay",
                                       "createAvatarSet"]}],
                "completion_criteria": {"type": "UI_displayed",
                                        "description": "Rules shown."},
                "next_phase": {"id": 1, "name": "Council Discussion"},
            },
            1: {
                "name": "Council Discussion",
                "description": "Members discuss who should leave.",
                "actions": [{"description": "TIER 1: discussion prompt",
                             "tools": ["clearCanvas", "createTextDisplay"]}],
                "completion_criteria": {"type": "timer",
                                        "description": "Brief discussion."},
                "next_phase": {"id": 2, "name": "Council Vote"},
            },
            2: {
                "name": "Council Vote",
                "description": f"Each member chooses one target to {vote_verb}.",
                "actions": [{"description": "TIER 1: voting panel",
                             "tools": ["clearCanvas", "createVotingPanel"]}],
                "completion_criteria": {
                    "type": "player_action",
                    "wait_for": "all_players_action",
                    "description": "All living members have voted.",
                    "target_players": {"condition": "player.is_alive == true"},
                },
                "next_phase": {"id": 3, "name": resolve_name},
            },
            3: {
                "name": resolve_name,
                "description": (
                    f"The member with the most votes is {elim_verb} by vote "
                    "of the council."
                ),
                "actions": [{"description": "TIER 1: announce result",
                             "tools": ["clearCanvas", "createResultDisplay",
                                       "markPlayerDead"]}],
                "completion_criteria": {"type": "UI_displayed",
                                        "description": "Result shown."},
                "next_phase": {"id": 4, "name": "Check Council Size"},
            },
            4: {
                "name": "Check Council Size",
                "description": "Evaluate whether the council is down to one.",
                "actions": [{"description": "TIER 1: status",
                             "tools": ["clearCanvas", "createTextDisplay"]}],
                "completion_criteria": {"type": "UI_displayed",
                                        "description": "Routing decision."},
                "next_phase": {
                    "If only one player remains alive, the game ends.": {
                        "id": 99, "name": "Game Over"},
                    "Otherwise, the council continues.": {
                        "id": 1, "name": "Council Discussion"},
                },
            },
            99: {
                "name": "Game Over",
                "description": "The last member standing wins.",
                "actions": [{"description": "TIER 1: final",
                             "tools": ["clearCanvas", "createResultDisplay"]}],
                "completion_criteria": {"type": "UI_displayed",
                                        "description": "Done."},
                "next_phase": None,
            },
        },
    }


def test_known_vocabulary_council_runs_clean():
    """Control: the same structure with analyzer-known vocabulary validates
    clean and runs to termination with oracle<->engine parity."""
    outcome, issues = _run_contract(_council_doc(), "council-known")
    assert outcome == "ran", [str(i) for i in issues]


@pytest.mark.parametrize("verbs", [
    ("expelled", "expel", "Expulsion Resolution"),
    ("banished", "banish", "Banishment Rite"),
    ("ostracized", "ostracize", "The Ostracism"),
    ("cast out", "cast out", "The Casting Out"),
])
def test_synonym_elimination_is_loud(verbs):
    """The 'expel instead of eliminate' test: vocabulary outside the
    analyzer's keyword lists must draw a validator warning instead of
    compiling into a game where elimination silently never happens."""
    elim, vote, name = verbs
    doc = _council_doc(elim_verb=elim, vote_verb=vote, resolve_name=name)
    issues, spec = validate_doc(doc, name=f"council-{vote}")
    assert spec is not None
    texts = [str(i) for i in issues]
    assert issues, "synonym game validated clean — silent semantic gap"
    assert any("never recorded" in t or "no mechanic" in t for t in texts), texts


def test_ritual_night_resolution_is_loud():
    """'Perform the ritual' instead of 'resolve night actions' must not
    silently drop NightResolve."""
    doc = _council_doc()
    # make the vote nocturnal and the resolution ritual-flavoured
    doc["phases"][2]["description"] = "Each member secretly marks one target."
    doc["phases"][3]["name"] = "The Midnight Ritual"
    doc["phases"][3]["description"] = (
        "Perform the ritual: the marked member leaves the circle."
    )
    issues, spec = validate_doc(doc, name="ritual")
    assert spec is not None
    assert any("never recorded" in str(i) or "no mechanic" in str(i)
               for i in issues), [str(i) for i in issues]


def test_unused_field_is_loud():
    doc = _council_doc()
    doc["declaration"]["player_states"]["karma"] = {
        "type": "num", "example": 0, "description": "Mystery counter."}
    doc["declaration"]["player_states_template"]["player_states"]["1"]["karma"] = 0
    issues, _ = validate_doc(doc, name="unused-field")
    assert any("karma" in str(i) and "never read or written" in str(i)
               for i in issues), [str(i) for i in issues]


def test_always_branch_shadowing_is_loud():
    doc = _council_doc()
    doc["phases"][4]["next_phase"] = {
        "The game continues to the next round.": {"id": 1,
                                                  "name": "Council Discussion"},
        "If only one player remains alive, the game ends.": {
            "id": 99, "name": "Game Over"},
    }
    issues, _ = validate_doc(doc, name="shadowed-branch")
    assert any("unreachable" in str(i) and "always" in str(i)
               for i in issues), [str(i) for i in issues]


# ---------------------------------------------------------------------------
# Grammar-level random generator (not blueprint mutations)
# ---------------------------------------------------------------------------

_VOTE_DESCS = [
    "Each living member chooses one target to eliminate.",
    "All players vote to expel one member.",
    "Members secretly pick somebody to shun.",
    "Each player selects a target for removal.",
]
_RESOLVE_DESCS = [
    "The player with the most votes is eliminated by vote.",
    "The chosen member is banished from the village.",
    "Apply the verdict: the marked player departs.",
    "The council's decision is carried out at dawn.",
]
_BRANCHES = [
    "If only one player remains alive, the game ends.",
    "If two or more players remain alive, the game continues.",
    "When the moon is full, the spirits decide.",
    "Otherwise, the game continues.",
    "If the jury is satisfied, close the case.",
]
_EXTRA_FIELDS = [
    ("suspicion", {"type": "num", "example": 0, "description": "Suspicion level."}),
    ("warded", {"type": "boolean", "example": False, "description": "Warded tonight."}),
    ("grudges", {"type": "dict", "example": {"2": "old feud"},
                 "description": "Private grudge notes."}),
]


def _grammar_doc(rng):
    """Random DSL straight from the schema grammar: random phase graph,
    random completion types, vocabulary drawn from mixed known/alien pools."""
    doc = _council_doc(
        elim_verb="eliminated",
        vote_verb="eliminate",
    )
    phases = doc["phases"]
    # random vocabulary swaps
    phases[2]["description"] = _VOTE_DESCS[rng.integers(len(_VOTE_DESCS))]
    phases[3]["description"] = _RESOLVE_DESCS[rng.integers(len(_RESOLVE_DESCS))]
    # random branch set (ordered, first-match-wins)
    n_br = 1 + int(rng.integers(3))
    picks = list(rng.permutation(len(_BRANCHES))[:n_br])
    branch_map = {}
    for k in picks:
        target = {"id": 99, "name": "Game Over"} if rng.random() < 0.5 else \
            {"id": 1, "name": "Council Discussion"}
        branch_map[_BRANCHES[k]] = target
    # guarantee the graph can terminate structurally
    branch_map.setdefault("If only one player remains alive, the game ends.",
                          {"id": 99, "name": "Game Over"})
    phases[4]["next_phase"] = branch_map
    # random completion flavour on the discussion phase
    if rng.random() < 0.5:
        phases[1]["completion_criteria"] = {
            "type": "UI_displayed", "description": "Prompt shown."}
    # random extra declared fields (some never used anywhere)
    for fname, fdef in _EXTRA_FIELDS:
        if rng.random() < 0.4:
            doc["declaration"]["player_states"][fname] = dict(fdef)
            doc["declaration"]["player_states_template"]["player_states"]["1"][
                fname] = fdef["example"] if fdef["type"] != "dict" else {}
    # occasionally drop the terminal phase entirely (must be rejected)
    if rng.random() < 0.15:
        phases[4]["next_phase"] = {"Otherwise, the game continues.": {
            "id": 1, "name": "Council Discussion"}}
        del phases[99]
    # random P18 mechanic hints — sometimes sensible, sometimes nonsense or
    # unanchorable; the contract is unchanged: reject loudly or run correct
    _HINT_POOL = ["vote_elimination", "night_resolution", "target",
                  "minority_score", "auction", "telekinesis",
                  {"winner": "survivor"}, {"winner": "richest"},
                  {"income": {"suspicion": 1}}, {"reveal": "warded"}]
    for pid in (2, 3, 99):
        if pid in phases and rng.random() < 0.35:
            k = int(rng.integers(len(_HINT_POOL)))
            phases[pid]["mechanics"] = [_HINT_POOL[k]]
    return doc


@pytest.mark.parametrize("seed", range(12))
def test_grammar_fuzz_loud_or_correct(seed):
    rng = np.random.default_rng(seed + 1000)
    doc = _grammar_doc(rng)
    outcome, issues = _run_contract(doc, f"grammar-{seed}", seed=seed)
    # every outcome is acceptable EXCEPT a clean validation that fails to
    # terminate — _run_contract asserts that internally. Record the split so
    # a regression to all-rejected shows up.
    assert outcome in ("rejected", "warned", "ran")
