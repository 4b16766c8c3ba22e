"""Mechanics analyzer tests: the determinized referee must derive the right
programs from both shipped DSLs (nothing is hardcoded per game)."""

from game_engine_tpu.gamespec import mechanics as M
from game_engine_tpu.gamespec.compile import compile_game
from game_engine_tpu.gamespec.layout import build_layout
from game_engine_tpu.gamespec.mechanics import ChoiceKind


def _programs(spec):
    return M.analyze(spec, build_layout(spec.declaration))


def test_werewolf_record_programs(werewolf_spec):
    progs = _programs(werewolf_spec)
    # werewolf night choice (phase 2): target choice, writes submit flag + target id
    rp = progs[2].record
    assert rp.choice_kind is ChoiceKind.TARGET
    assert "night_action_submitted" in rp.set_bool_true
    assert rp.write_choice_num == "selected_target_id"
    # detective (phase 4): also writes investigated_alignments from team
    rp4 = progs[4].record
    assert rp4.choice_kind is ChoiceKind.TARGET
    assert rp4.write_pdict == ("investigated_alignments", "team")
    # day voting (phase 7): target vote, no named fields
    rp7 = progs[7].record
    assert rp7.choice_kind is ChoiceKind.TARGET
    assert rp7.write_choice_num is None


def test_werewolf_night_resolution(werewolf_spec):
    progs = _programs(werewolf_spec)
    nr5 = [m for m in progs[5].on_enter if isinstance(m, M.NightResolve)]
    assert len(nr5) == 1
    assert nr5[0].kill_phases == frozenset({2})
    assert nr5[0].protect_phases == frozenset({3})
    assert "night_action_submitted" in nr5[0].reset_bools
    assert "selected_target_id" in nr5[0].reset_nums
    nr13 = [m for m in progs[13].on_enter if isinstance(m, M.NightResolve)]
    assert nr13[0].kill_phases == frozenset({10})
    assert nr13[0].protect_phases == frozenset({11})
    # morning phases must NOT also get vote elimination
    assert not any(isinstance(m, M.VoteElim) for m in progs[5].on_enter)


def test_werewolf_vote_elim_and_roles(werewolf_spec):
    progs = _programs(werewolf_spec)
    ve8 = [m for m in progs[8].on_enter if isinstance(m, M.VoteElim)]
    assert len(ve8) == 1 and ve8[0].vote_phases == frozenset({7})
    ve16 = [m for m in progs[16].on_enter if isinstance(m, M.VoteElim)]
    assert ve16[0].vote_phases == frozenset({15})

    ra = [m for m in progs[1].on_enter if isinstance(m, M.RoleAssign)]
    assert len(ra) == 1
    counts = dict(ra[0].role_counts)
    assert counts == {"Villager": 1, "Werewolf": 1, "Doctor": 1, "Detective": 1}
    assert ra[0].filler_role == "Villager"
    assert M.role_multiset(ra[0], 6).count("Villager") == 3
    assert M.role_multiset(ra[0], 4).count("Werewolf") == 1
    rf = dict(ra[0].role_fields)
    wolf_settings = dict(rf["Werewolf"])
    assert wolf_settings.get("team") == "werewolves"
    assert wolf_settings.get("night_action_eligible") is True
    # terminal phase: team-mode game over, minority team first
    go = [m for m in progs[99].on_enter if isinstance(m, M.GameOver)]
    assert go[0].mode == "team"
    assert go[0].team_order[0] == "werewolves"


def test_twotruths_programs(twotruths_spec):
    progs = _programs(twotruths_spec)
    # statement collection (2): text submit
    rp2 = progs[2].record
    assert rp2.choice_kind is ChoiceKind.SUBMIT
    assert rp2.mark_odict == "statements"
    assert "statements_submitted" in rp2.set_bool_true
    # lie selection (3): option 1-3
    rp3 = progs[3].record
    assert rp3.choice_kind is ChoiceKind.OPTION and rp3.choice_max == 3
    assert rp3.write_choice_num == "lie_index"
    # voting (5): option 1-3 with has_voted
    rp5 = progs[5].record
    assert rp5.choice_kind is ChoiceKind.OPTION and rp5.choice_max == 3
    assert rp5.write_choice_num == "vote_choice"
    assert "has_voted" in rp5.set_bool_true
    # round start (1): speaker rotation resetting round-scoped fields
    rot = [m for m in progs[1].on_enter if isinstance(m, M.SpeakerRotate)]
    assert len(rot) == 1
    assert set(rot[0].reset_bools) >= {"statements_submitted", "has_voted", "lie_revealed"}
    assert set(rot[0].reset_nums) >= {"lie_index", "vote_choice"}
    assert "total_score" not in rot[0].reset_nums
    assert "rounds_as_speaker" not in rot[0].reset_nums
    # reveal (6): lie_revealed set-all
    sba = [m for m in progs[6].on_enter if isinstance(m, M.SetBoolAll)]
    assert sba and sba[0].fields == ("lie_revealed",)
    # scoring (7): guess-score with rounds increment
    gsc = [m for m in progs[7].on_enter if isinstance(m, M.GuessScore)]
    assert len(gsc) == 1 and gsc[0].rounds_field == "rounds_as_speaker"
    # terminal: score-mode
    go = [m for m in progs[99].on_enter if isinstance(m, M.GameOver)]
    assert go[0].mode == "score" and go[0].score_field == "total_score"


def test_compile_game_end_to_end(werewolf_spec, twotruths_spec):
    for spec in (werewolf_spec, twotruths_spec):
        cg = compile_game(spec)
        assert cg.n_phases == len(spec.phases)
        assert cg.phases[cg.start_index].dsl_id == 0
        for cp in cg.phases:
            if not cp.terminal and not cp.branches:
                assert cp.next_index is not None
        term = [p for p in cg.phases if p.terminal]
        assert len(term) == 1 and term[0].dsl_id == 99
    # werewolf phase 9 gets the forced Always fallback appended (P5)
    cw = compile_game(werewolf_spec)
    p9 = cw.phase_by_id(9)
    assert len(p9.branches) == 5
    from game_engine_tpu.gamespec.conditions import AlwaysTrue
    assert isinstance(p9.branches[-1].cond, AlwaysTrue)


def test_splitmix_determinism():
    assert M.splitmix32(0) == M.splitmix32(0)
    perms = {tuple(M.role_permutation(s, 6)) for s in range(50)}
    assert len(perms) > 10  # actually shuffles
    assert sorted(M.role_permutation(7, 6)) == [0, 1, 2, 3, 4, 5]


# -- round-4 review fixes -----------------------------------------------------


def test_role_settings_value_from_row_having_field():
    """The constant-per-role value must come from a row that HAS the
    field; rows[0] may omit it, which used to set the literal None."""
    import copy

    from game_engine_tpu.gamespec.layout import build_layout
    from game_engine_tpu.gamespec.parser import load_builtin

    spec = load_builtin("werewolf-(mafia)")
    doc_rows = spec.declaration.players_example
    # drop 'team' from the FIRST werewolf row only
    rows = {k: dict(v) for k, v in doc_rows.items()}
    wolf_ids = [k for k, v in rows.items() if v.get("role") == "Werewolf"]
    assert wolf_ids, "no werewolf example row"
    # a second wolf row that HAS team, while the FIRST one drops it
    new_id = max(int(k) for k in map(int, rows)) + 1
    rows[new_id] = dict(rows[wolf_ids[0]])
    rows[wolf_ids[0]].pop("team")
    spec2 = copy.deepcopy(spec)
    object.__setattr__(spec2.declaration, "players_example", rows)
    layout = build_layout(spec2.declaration)
    ra = M._build_role_assign(spec2, layout)
    team_settings = {r: dict(fs).get("team") for r, fs in ra.role_fields}
    assert team_settings.get("Werewolf") not in (None, "None"), team_settings


def test_option_range_detection_case_insensitive():
    assert M._RE_RANGE.search("Options 1, 2, 3") is not None
    assert M._RE_RANGE.search("options 1, 2, 3") is not None
    assert M._RE_RANGE.search("(1-4)") is not None


def test_winner_mapping_without_score_is_loud():
    """{winner: {mode: survivor}} must not silently become score mode."""
    import pytest

    import yaml as _yaml

    from game_engine_tpu.gamespec.compile import compile_game
    from game_engine_tpu.gamespec.parser import games_dir, parse_game_spec
    import os

    doc = _yaml.safe_load(open(os.path.join(games_dir(), "tide-pool.yaml")))
    doc["phases"][99]["mechanics"] = [{"winner": {"mode": "survivor"}}]
    spec = parse_game_spec(doc, name="bad-winner")
    with pytest.raises(M.MechanicHintError, match="no 'score' key"):
        compile_game(spec)


def test_short_statement_dicts_stay_opaque():
    """Dict fields with small-int keys but multi-word values are free text
    (statements/notes) -> opaque mark-slots, NOT a player-keyed matrix —
    even when every value is 3 words or fewer."""
    from game_engine_tpu.gamespec.layout import BANK_ODICT, BANK_PDICT, build_layout
    from game_engine_tpu.gamespec.parser import parse_game_spec

    doc = {
        "declaration": {
            "player_states": {
                "statements": {"type": "dict",
                               "example": {"1": "I ski daily", "2": "I hate cats"}},
                "marks": {"type": "dict", "example": {"2": "claimed"}},
            },
        },
        "phases": {0: {"name": "Intro", "next_phase": None}},
    }
    lay = build_layout(parse_game_spec(doc, name="st").declaration)
    assert lay.slot("statements").bank == BANK_ODICT
    assert lay.slot("marks").bank == BANK_PDICT
