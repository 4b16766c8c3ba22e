"""Predicate-compiler tests over the DSL's criteria strings."""

import pytest

from game_engine_tpu.gamespec.expr import (
    And,
    Atom,
    Const,
    PredicateError,
    collect_atoms,
    eval_predicate,
    parse_predicate,
    to_dnf,
)


def test_simple_and():
    p = parse_predicate("player.team == 'werewolves' and player.is_alive == true")
    assert isinstance(p, And)
    wolf = {"team": "werewolves", "is_alive": True}
    dead_wolf = {"team": "werewolves", "is_alive": False}
    villager = {"team": "villagers", "is_alive": True}
    assert eval_predicate(p, wolf)
    assert not eval_predicate(p, dead_wolf)
    assert not eval_predicate(p, villager)


def test_in_list():
    p = parse_predicate("player.role in ['Doctor', 'Detective'] and player.is_alive == true")
    assert eval_predicate(p, {"role": "Doctor", "is_alive": True})
    assert eval_predicate(p, {"role": "Detective", "is_alive": True})
    assert not eval_predicate(p, {"role": "Villager", "is_alive": True})
    assert not eval_predicate(p, {"role": "Doctor", "is_alive": False})


def test_false_comparison():
    p = parse_predicate("player.is_speaker == false and player.can_vote == true")
    assert eval_predicate(p, {"is_speaker": False, "can_vote": True})
    assert not eval_predicate(p, {"is_speaker": True, "can_vote": True})


def test_numeric_and_flip():
    p = parse_predicate("player.total_score >= 3")
    assert eval_predicate(p, {"total_score": 3})
    assert not eval_predicate(p, {"total_score": 2})
    flipped = parse_predicate("3 <= player.total_score")
    assert eval_predicate(flipped, {"total_score": 5})


def test_bare_truthy_and_not():
    p = parse_predicate("player.is_alive and not player.has_voted")
    assert eval_predicate(p, {"is_alive": True, "has_voted": False})
    assert not eval_predicate(p, {"is_alive": True, "has_voted": True})


def test_empty_is_true():
    assert parse_predicate("") == Const(True)
    assert eval_predicate(parse_predicate("   "), {})


def test_or_dnf():
    p = parse_predicate("player.role == 'Doctor' or (player.role == 'Detective' and player.is_alive == true)")
    dnf = to_dnf(p)
    assert len(dnf) == 2
    atoms = collect_atoms(p)
    assert Atom("role", "eq", "Doctor") in atoms


def test_in_expands_in_dnf():
    p = parse_predicate("player.role in ['A', 'B']")
    dnf = to_dnf(p)
    assert dnf == [[Atom("role", "eq", "A")], [Atom("role", "eq", "B")]]
    neg = parse_predicate("not (player.role in ['A', 'B'])")
    dnf_neg = to_dnf(neg)
    assert dnf_neg == [[Atom("role", "ne", "A"), Atom("role", "ne", "B")]]


def test_malformed_raises():
    with pytest.raises(PredicateError):
        parse_predicate("player.x ==")
    with pytest.raises(PredicateError):
        parse_predicate("__import__('os').system('x')")


def test_all_shipped_criteria_compile(werewolf_spec, twotruths_spec):
    for spec in (werewolf_spec, twotruths_spec):
        for g in spec.declaration.audience_groups:
            parse_predicate(g.selection_criteria)
        for ph in spec.phases.values():
            parse_predicate(ph.completion.target_condition)


def test_string_compare_case_insensitive():
    """The table lowering resolves string literals case-insensitively
    (tables.py _lower_atom / layout.py Slot.encode); the oracle must agree
    or parity breaks on any casing mismatch (CLAUDE.md invariant 1)."""
    p = parse_predicate("player.role == 'werewolf'")
    assert eval_predicate(p, {"role": "Werewolf"})
    assert not eval_predicate(parse_predicate("player.role != 'WEREWOLF'"),
                              {"role": "werewolf"})
    assert eval_predicate(parse_predicate("player.role in ['doctor', 'SEER']"),
                          {"role": "Seer"})
    assert not eval_predicate(
        parse_predicate("player.role not in ['doctor', 'SEER']"),
        {"role": "Seer"})


def test_null_comparison_rejected():
    with pytest.raises(PredicateError):
        parse_predicate("player.votes == null")
    with pytest.raises(PredicateError):
        parse_predicate("player.is_alive != none")
    with pytest.raises(PredicateError):
        parse_predicate("player.role in ['Seer', null]")


def test_ordered_string_comparison_rejected():
    # lexicographic (oracle) vs vocab-code order (engine) would diverge
    with pytest.raises(PredicateError):
        parse_predicate("player.role > 'Doctor'")
    with pytest.raises(PredicateError):
        parse_predicate("'Doctor' <= player.role")
    # ordered numeric comparisons stay fine
    assert eval_predicate(parse_predicate("player.coins > 2"), {"coins": 3})


def test_dnf_blowup_capped():
    many = ", ".join(f"'w{i}'" for i in range(200))
    with pytest.raises(PredicateError):
        to_dnf(parse_predicate(f"player.word in [{many}]"))
    # And-product caps incrementally (never materializes the full product)
    a = ", ".join(f"'a{i}'" for i in range(60))
    b = ", ".join(f"'b{i}'" for i in range(60))
    with pytest.raises(PredicateError):
        to_dnf(parse_predicate(f"player.x in [{a}] and player.y in [{b}]"))
