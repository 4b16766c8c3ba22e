"""Parser tests against the two shipped game DSLs."""

from game_engine_tpu.gamespec.parser import parse_game_spec
from game_engine_tpu.gamespec.schema import CompletionType, FieldType, WaitFor


def test_werewolf_declaration(werewolf_spec):
    d = werewolf_spec.declaration
    assert d.is_multiplayer
    assert d.min_players == 4
    assert [r.name for r in d.roles] == ["Villager", "Werewolf", "Doctor", "Detective"]
    names = d.field_names()
    assert "is_alive" in names and "role" in names and "team" in names
    assert d.field("is_alive").type is FieldType.BOOLEAN
    assert d.field("is_alive").default is True
    assert d.field("selected_target_id").type is FieldType.NUM
    assert d.field("selected_target_id").default == 0
    assert d.field("investigated_alignments").type is FieldType.DICT
    assert len(d.audience_groups) == 8
    assert 4 in d.players_example and d.players_example[4]["role"] == "Detective"


def test_werewolf_phases(werewolf_spec):
    s = werewolf_spec
    assert s.phase_ids == [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 99]
    assert s.start_phase_id == 0
    p0 = s.phases[0]
    assert p0.name == "Game Introduction"
    assert p0.completion.type is CompletionType.UI_DISPLAYED
    assert p0.next_id == 1
    p2 = s.phases[2]
    assert p2.completion.type is CompletionType.PLAYER_ACTION
    assert p2.completion.wait_for is WaitFor.MULTIPLE
    assert "Werewolf" in p2.completion.target_condition
    p6 = s.phases[6]
    assert p6.completion.type is CompletionType.TIMER
    p9 = s.phases[9]
    assert len(p9.branches) == 4
    assert p9.branches[0].phase_id == 99
    assert p9.branches[2].phase_id == 10
    assert p9.branches[3].phase_id == 14
    assert s.phases[99].is_terminal
    # first clearCanvas action rule
    assert p0.actions[0].tools == ("clearCanvas",)


def test_twotruths_phases(twotruths_spec):
    s = twotruths_spec
    assert s.phase_ids == [0, 1, 2, 3, 4, 5, 6, 7, 8, 99]
    p8 = s.phases[8]
    assert len(p8.branches) == 2
    assert p8.branches[0].phase_id == 99
    assert p8.branches[1].phase_id == 1  # loop back to Round Start
    assert s.declaration.tools[0] == "clearCanvas"
    assert s.declaration.field("total_score").type is FieldType.NUM


def test_defensive_normalization():
    doc = {
        "declaration": {
            "min_players": "3",
            "player_states": {
                "score": {"type": "number"},
                "alive": {"type": "bool"},
                "tag": {"type": "nonsense"},
            },
            # no template at all -> type defaults
        },
        "phases": {
            "0": {"name": "Intro", "next_phase": {"id": "1", "name": "X"}},
            1: {"name": "X", "next_phase": {"id": 42, "name": "dangling"}},
        },
    }
    s = parse_game_spec(doc, name="fuzz")
    assert s.declaration.min_players == 3
    assert s.declaration.field("score").default == 0
    assert s.declaration.field("alive").default is False
    assert s.declaration.field("tag").type is FieldType.STRING
    assert s.phases[0].next_id == 1  # str phase ids tolerated
    assert s.phases[1].next_id is None  # dangling id 42 dropped -> terminal


def test_list_shaped_sections_normalize():
    """Generated docs sometimes emit list-shaped mapping sections; each is
    normalized (names/dicts-with-name) instead of AttributeError-crashing."""
    doc = {
        "declaration": {
            "player_states": ["is_alive", {"name": "role", "type": "string"}],
            "audience_groups": [
                {"name": "wolves", "selection_criteria": "player.role == 'wolf'"},
            ],
        },
        "phases": [
            {"name": "Intro", "next_phase": {"id": 2, "name": "End"}},
            {"id": 2, "name": "End"},
        ],
    }
    s = parse_game_spec(doc, name="listy")
    assert {f.name for f in s.declaration.fields} == {"is_alive", "role"}
    assert s.declaration.audience_groups[0].name == "wolves"
    assert set(s.phases) == {1, 2}
    assert s.phases[1].next_id == 2
    # a string-shaped section is a clear ValueError, not an AttributeError
    import pytest
    with pytest.raises(ValueError, match="player_states"):
        parse_game_spec({"declaration": {"player_states": "oops"},
                         "phases": {0: {"name": "x"}}})


def test_mechanic_hint_nested_args_hashable():
    doc = {
        "declaration": {"player_states": {"coins": {"type": "number"}}},
        "phases": {
            0: {"name": "Intro",
                "mechanics": [{"deal": {"roles": ["Mafia", "Doctor"]}},
                              {"income": {"coins": {"base": 1}}}],
                "next_phase": None},
        },
    }
    s = parse_game_spec(doc, name="hints")
    hash(s.phases[0])  # must not raise: nested lists/dicts are frozen
    (h1, a1), (h2, a2) = s.phases[0].mechanic_hints
    assert h1 == "deal" and a1 == (("roles", ("Mafia", "Doctor")),)
    assert h2 == "income" and a2 == (("coins", (("base", 1),)),)


def test_min_players_zero_preserved():
    doc = {"declaration": {"min_players": 0,
                           "player_states": {"x": {"type": "boolean"}}},
           "phases": {0: {"name": "Intro", "next_phase": None}}}
    s = parse_game_spec(doc, name="zp")
    assert s.declaration.min_players == 0  # validator rejects it loudly


def test_load_builtin_guards():
    import pytest
    from game_engine_tpu.gamespec.parser import load_builtin
    with pytest.raises(FileNotFoundError):
        load_builtin("")
    with pytest.raises(FileNotFoundError):
        load_builtin("a")  # 1-char fuzzy queries must not match anything
    assert load_builtin("werewolf (mafia)").name == "werewolf-(mafia)"
    assert load_builtin("werewolf").name == "werewolf-(mafia)"  # fuzzy >= 3 chars
