"""Property tests over randomly generated DSL documents.

The 'generic generated-DSL workload' contract (BASELINE.json config 4): any
document the validator passes must compile, lower, and run to termination in
the oracle AND stay in lockstep with the jitted engine. Random docs are
built from mutated blueprints plus structural noise — this is the fuzz
harness the reference never had (SURVEY.md §4)."""

import numpy as np
import pytest

from game_engine_tpu.core.engine import BatchedEngine, scripted_actions
from game_engine_tpu.core.state import init_state
from game_engine_tpu.dslgen.generate import Blueprint, RoleDef, generate
from game_engine_tpu.dslgen.validate import errors, validate_doc
from game_engine_tpu.gamespec.compile import compile_game
from game_engine_tpu.gamespec.tables import lower
from game_engine_tpu.oracle.interp import OracleRoom
from game_engine_tpu.policies.scripted import oracle_policy
from tests.test_parity import assert_state_matches


def _mutate(doc, rng):
    """Structural noise the parser must tolerate (reference defensive rules)."""
    doc = dict(doc)
    phases = {str(k) if rng.random() < 0.5 else k: dict(v) for k, v in doc["phases"].items()}
    if rng.random() < 0.4:  # shuffled phase-key insertion order
        keys = list(phases)
        rng.shuffle(keys)
        phases = {k: phases[k] for k in keys}
    if rng.random() < 0.3:  # unknown extra keys in a phase
        k = list(phases)[0]
        phases[k] = {**phases[k], "x_custom_meta": {"anything": [1, 2]}}
    if rng.random() < 0.3:  # completion type casing variants
        for v in phases.values():
            cc = v.get("completion_criteria")
            if isinstance(cc, dict) and str(cc.get("type", "")).lower() == "ui_displayed":
                v["completion_criteria"] = {**cc, "type": "ui_displayed"}
                break
    doc["phases"] = phases
    decl = dict(doc["declaration"])
    if rng.random() < 0.5:
        decl["min_players"] = str(decl.get("min_players", 3))  # stringly-typed
    if rng.random() < 0.3:
        decl.pop("players_example", None)  # template-only fallback path
    if rng.random() < 0.3:
        decl["x_unknown_decl_key"] = "ignored"
    if rng.random() < 0.3 and "roles" in decl:  # unicode role descriptions
        decl["roles"] = [
            {**r, "description": r.get("description", "") + " — 夜行动 🎭"}
            for r in decl["roles"]
        ]
    doc["declaration"] = decl
    if rng.random() < 0.2:
        doc["x_unknown_root"] = [1, 2, 3]
    return doc


def _random_blueprint(rng):
    if rng.random() < 0.5:
        # elimination with random role names / optional protector+investigator
        suffix = rng.integers(100)
        roles = [
            RoleDef(f"Pawn{suffix}", "town", "", "No night action; votes during the day."),
            RoleDef(f"Hunter{suffix}", "hunters", "kill", "At night, chooses one target to eliminate."),
        ]
        if rng.random() < 0.7:
            roles.append(RoleDef(f"Shield{suffix}", "town", "protect",
                                 "At night, protects one player from elimination."))
        if rng.random() < 0.5:
            roles.append(RoleDef(f"Oracle{suffix}", "town", "investigate",
                                 "At night, investigates one player to learn their alignment."))
        return Blueprint(
            name=f"fuzz-elim-{suffix}", description="night elimination deduction game",
            archetype="elimination", min_players=len(roles), roles=tuple(roles),
        )
    if rng.random() < 0.4:
        return Blueprint(
            name=f"fuzz-rounds-{rng.integers(100)}",
            description="turn-based guessing rounds game",
            archetype="rounds", min_players=3,
        )
    if rng.random() < 0.4:
        return Blueprint(
            name=f"fuzz-battle-{rng.integers(100)}",
            description="vote-out battle royale, last one standing",
            archetype="battle", min_players=3,
        )
    if rng.random() < 0.5:
        # the round-4 IR-program families: conversion / pressluck /
        # racing / draft / masquerade — mutation must not break their
        # declared programs (masquerade exercises the `deal ... salt` path)
        arch = ("conversion", "pressluck", "racing",
                "draft", "masquerade")[int(rng.integers(5))]
        return Blueprint(
            name=f"fuzz-{arch}-{rng.integers(100)}",
            description=f"a {arch} party game",
            archetype=arch, min_players=3 + int(rng.integers(3)),
        )
    if rng.random() < 0.5:
        return Blueprint(
            name=f"fuzz-bluff-{rng.integers(100)}",
            description="coup-like bluff and challenge game",
            archetype="bluff", min_players=3 + int(rng.integers(3)),
        )
    return Blueprint(
        name=f"fuzz-market-{rng.integers(100)}",
        description="coin trading and raiding game",
        archetype="market", min_players=3 + int(rng.integers(3)),
    )


@pytest.mark.parametrize("fuzz_seed", range(8))
def test_fuzzed_dsl_runs_with_parity(fuzz_seed):
    rng = np.random.default_rng(fuzz_seed)
    bp = _random_blueprint(rng)
    doc = _mutate(generate(bp), rng)
    issues, spec = validate_doc(doc, name=bp.name)
    assert spec is not None, [str(i) for i in issues]
    assert not errors(issues), [str(i) for i in errors(issues)]

    lowered = lower(compile_game(spec))
    n = min(lowered.P, max(spec.declaration.min_players, 4))
    room = OracleRoom(lowered.game, n_players=n, seed=fuzz_seed)
    eng = BatchedEngine(lowered)
    state = init_state(lowered, 1, n, np.uint32(fuzz_seed))
    for t in range(400):
        room.step(oracle_policy(room, t, fuzz_seed))
        state = eng.step(state, scripted_actions(lowered, state))
        assert_state_matches(lowered, room, state, 0, t)
        if room.done:
            break
    assert room.done, f"fuzzed game {bp.name} did not terminate"
    assert room.winner >= 1


def test_validator_rejects_garbage():
    cases = [
        None,
        [],
        {"declaration": {}},
        {"phases": {}},
        {"declaration": {"player_states": {"x": {"type": "num"}}}, "phases": {}},
    ]
    for doc in cases:
        issues, spec = validate_doc(doc)
        assert errors(issues) or spec is None


def test_min_players_boundaries():
    bp = Blueprint(name="b", description="night elimination game", archetype="elimination")
    doc = generate(bp)
    issues, spec = validate_doc(doc)
    assert not errors(issues)
    lowered = lower(compile_game(spec))
    # smallest and largest room sizes both terminate
    for n in (spec.declaration.min_players, lowered.P):
        room = OracleRoom(lowered.game, n_players=n, seed=1)
        for t in range(400):
            room.step(oracle_policy(room, t, 1))
            if room.done:
                break
        assert room.done, f"n={n} stuck at {room.phase.dsl_id}"
