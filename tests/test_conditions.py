"""NL branch-condition compiler tests: the werewolf win checks and the
two-truths round-progress check must compile to the exact pinned IR."""

from game_engine_tpu.gamespec.conditions import (
    AllPresent,
    AlwaysTrue,
    ConditionContext,
    CountCmp,
    PrevPhaseIn,
    compile_branch_condition,
    eval_condition,
)
from game_engine_tpu.gamespec.expr import eval_predicate


def _players(*rows):
    return {i + 1: r for i, r in enumerate(rows)}


def test_werewolf_phase9_branches(werewolf_spec):
    ctx = ConditionContext(werewolf_spec)
    branches = werewolf_spec.phases[9].branches

    c0, ok0 = compile_branch_condition(branches[0].condition, ctx)
    assert ok0 and isinstance(c0, CountCmp) and c0.op == "eq" and c0.right == 0

    c1, ok1 = compile_branch_condition(branches[1].condition, ctx)
    assert ok1 and isinstance(c1, CountCmp) and c1.op == "ge"

    c2, ok2 = compile_branch_condition(branches[2].condition, ctx)
    assert ok2 and isinstance(c2, PrevPhaseIn)
    # "follows a day elimination" -> the two announce-day-voting-results phases
    assert c2.phase_ids == frozenset({8, 16})

    c3, ok3 = compile_branch_condition(branches[3].condition, ctx)
    assert ok3 and isinstance(c3, PrevPhaseIn)
    # "follows a night resolution" -> the two morning announce phases
    assert c3.phase_ids == frozenset({5, 13})


def test_werewolf_win_evaluation(werewolf_spec):
    ctx = ConditionContext(werewolf_spec)
    branches = werewolf_spec.phases[9].branches
    c0, _ = compile_branch_condition(branches[0].condition, ctx)
    c1, _ = compile_branch_condition(branches[1].condition, ctx)

    wolf = {"team": "werewolves", "is_alive": True}
    dead_wolf = {"team": "werewolves", "is_alive": False}
    vil = {"team": "villagers", "is_alive": True}

    # all werewolves dead -> village wins
    assert eval_condition(c0, _players(dead_wolf, vil, vil, vil), prev_phase_id=8)
    # 2 wolves vs 2 villagers -> werewolves win (>=)
    assert eval_condition(c1, _players(wolf, wolf, vil, vil), prev_phase_id=8)
    # 1 wolf vs 3 villagers -> game continues
    assert not eval_condition(c0, _players(wolf, vil, vil, vil), prev_phase_id=8)
    assert not eval_condition(c1, _players(wolf, vil, vil, vil), prev_phase_id=8)


def test_group_resolution_uses_audience_groups(werewolf_spec):
    ctx = ConditionContext(werewolf_spec)
    # 'Werewolves' must resolve via the audience group (team-based), so the
    # Doctor/Detective count as villagers for win checks.
    c1, _ = compile_branch_condition(
        "If living Werewolves are equal to or outnumber living Villagers", ctx
    )
    doc = {"team": "villagers", "is_alive": True, "role": "Doctor"}
    wolf = {"team": "werewolves", "is_alive": True, "role": "Werewolf"}
    assert not eval_condition(c1, _players(wolf, doc, doc), prev_phase_id=None)
    assert eval_condition(c1, _players(wolf, wolf, doc, doc), prev_phase_id=None)


def test_twotruths_phase8_branches(twotruths_spec):
    ctx = ConditionContext(twotruths_spec, rounds_per_player=1)
    branches = twotruths_spec.phases[8].branches

    c0, ok0 = compile_branch_condition(branches[0].condition, ctx)
    assert ok0 and isinstance(c0, AllPresent)
    assert c0.pred.field == "rounds_as_speaker"
    assert c0.pred.op == "ge" and c0.pred.value == 1

    c1, _ = compile_branch_condition(branches[1].condition, ctx)
    assert isinstance(c1, AlwaysTrue)

    done = {"rounds_as_speaker": 1}
    not_done = {"rounds_as_speaker": 0}
    assert eval_condition(c0, _players(done, done, done), prev_phase_id=7)
    assert not eval_condition(c0, _players(done, not_done, done), prev_phase_id=7)


def test_unrecognized_falls_through_permissively(werewolf_spec):
    ctx = ConditionContext(werewolf_spec)
    cond, ok = compile_branch_condition("If the moon is gibbous and waxing", ctx)
    assert not ok
    assert isinstance(cond, AlwaysTrue)


def test_target_conditions_still_eval(werewolf_spec):
    # sanity: group preds from audience_groups actually work in counts
    ctx = ConditionContext(werewolf_spec)
    g = ctx.groups["werewolves"]
    assert eval_predicate(g, {"team": "werewolves", "is_alive": True})
    assert not eval_predicate(g, {"team": "werewolves", "is_alive": False})


def test_any_player_n_or_fewer_field():
    """'any player has N or fewer <field>' -> count(field <= N) > 0, with
    snake_case field names quoted verbatim in the prose (relic-draft's
    pool-exhaustion branch)."""
    from game_engine_tpu.gamespec.parser import load_builtin

    spec = load_builtin("relic-draft")
    ctx = ConditionContext(spec)
    cond, ok = compile_branch_condition(
        "If any player has 0 or fewer pool_left", ctx)
    assert ok and isinstance(cond, CountCmp)
    assert cond.left.field == "pool_left"
    assert cond.left.op == "le" and cond.left.value == 0
    assert cond.op == "gt" and cond.right == 0
    empty = {"pool_left": 0}
    stocked = {"pool_left": 3}
    assert eval_condition(cond, _players(empty, stocked), prev_phase_id=1)
    assert not eval_condition(cond, _players(stocked, stocked), prev_phase_id=1)


# -- round-4 review fixes -----------------------------------------------------


def test_articles_before_group_words():
    """'outnumber the living Villagers' used to capture 'the' as the group
    word and compile to AlwaysTrue (progression bias would then end the
    game with the wrong winner)."""
    from game_engine_tpu.gamespec import conditions as C
    from game_engine_tpu.gamespec.parser import load_builtin

    ctx = C.ConditionContext(load_builtin("werewolf-(mafia)"))
    for sent in (
        "If living Werewolves are equal to or outnumber the living Villagers",
        "If the Werewolves outnumber the Villagers",
        "If any Werewolves outnumber all Villagers",
    ):
        cond, ok = C.compile_branch_condition(sent, ctx)
        assert ok, sent
        assert type(cond).__name__ == "CountCmp", (sent, cond)


def test_no_players_remain_compiles():
    from game_engine_tpu.gamespec import conditions as C
    from game_engine_tpu.gamespec.parser import load_builtin

    ctx = C.ConditionContext(load_builtin("werewolf-(mafia)"))
    cond, ok = C.compile_branch_condition("If no living players remain", ctx)
    assert ok and type(cond).__name__ == "CountCmp"


def test_resolve_group_candidate_order_deterministic():
    """Candidates are probed in fixed priority order (word, singular,
    plural) — a set would make the winner hash-order dependent when
    several candidates match different entries."""
    from game_engine_tpu.gamespec import conditions as C
    from game_engine_tpu.gamespec.parser import load_builtin

    ctx = C.ConditionContext(load_builtin("werewolf-(mafia)"))
    a = ctx.resolve_group("Werewolves", living=True)
    for _ in range(5):
        assert ctx.resolve_group("Werewolves", living=True) == a
