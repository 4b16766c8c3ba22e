"""Information-set (determinized) search tier: the Determinizer's
observable-projection invariants, the C++ per-candidate scores API's
bit-identity with gs_room_search, and the determinized SearchBots
decision path. The full-information tier reads the true state (an
engine-side referee bot); this tier sees only what policies/net.py
observe() would show the searching seat — the honest counterpart of the
reference's prompt-view bots (reference: agent/game_agent_v2.py:496-520)."""

import numpy as np
import pytest

from game_engine_tpu.gamespec.compile import compile_game
from game_engine_tpu.gamespec.parser import load_builtin
from game_engine_tpu.gamespec.tables import lower
from game_engine_tpu.native import available
from game_engine_tpu.native.lib import CppGame
from game_engine_tpu.policies.net import field_visibility, minority_team_code
from game_engine_tpu.policies.search import Determinizer, SearchBots

pytestmark = pytest.mark.skipif(not available(), reason="native lib unavailable")


@pytest.fixture(scope="module")
def ww():
    return lower(compile_game(load_builtin("werewolf")))


def _stepped_state(lowered, seed, steps):
    g = CppGame(lowered)
    room = g.room(6, seed)
    for _ in range(steps):
        if room.read()["done"]:
            break
        room.step(room.policy_actions())
    return g, room


def test_determinizer_preserves_observable_projection(ww):
    lay = ww.game.layout
    role_idx = lay.get("role").index
    team_idx = lay.get("team").index
    alive_idx = lay.get("is_alive").index
    minority = minority_team_code(ww)
    vis = field_visibility(ww)
    public_bools = [lay.get(f.name).index
                    for f in ww.game.spec.declaration.fields
                    if vis.get(f.name, 0) == 0 and lay.get(f.name) is not None
                    and lay.get(f.name).bank == "bool"]
    det = Determinizer(ww)
    for seed in (3, 11, 29):
        _, room = _stepped_state(ww, seed, 4)
        st = room.read()
        strs = np.asarray(st["strs"])
        for p0 in range(6):
            out = det.apply(st, p0, 6, dseed=1000 + seed)
            o_strs = np.asarray(out["strs"])
            # searcher's own row is untouched, every bank
            for k in ("bools", "nums", "strs", "pdict", "odict",
                      "acted", "choice", "choice_phase"):
                np.testing.assert_array_equal(
                    np.asarray(out[k])[p0], np.asarray(st[k])[p0], err_msg=k)
            # public fields untouched for everyone
            np.testing.assert_array_equal(
                np.asarray(out["bools"])[:, alive_idx],
                np.asarray(st["bools"])[:, alive_idx])
            for bi in public_bools:
                np.testing.assert_array_equal(
                    np.asarray(out["bools"])[:, bi],
                    np.asarray(st["bools"])[:, bi])
            # hidden multisets preserved (uniform relabeling, never invention)
            for idx in (role_idx, team_idx):
                assert sorted(o_strs[:6, idx].tolist()) == \
                    sorted(strs[:6, idx].tolist())
            # a coordinating-minority searcher keeps seeing its teammates
            if minority is not None and int(strs[p0, team_idx]) == minority:
                for q in range(6):
                    if q != p0 and int(strs[q, team_idx]) == minority:
                        assert int(o_strs[q, team_idx]) == minority
                        assert o_strs[q, role_idx] == strs[q, role_idx]
            # deterministic in dseed
            out2 = det.apply(st, p0, 6, dseed=1000 + seed)
            np.testing.assert_array_equal(o_strs, np.asarray(out2["strs"]))


def test_determinizer_actually_resamples(ww):
    """Across dseeds, a majority searcher's view of WHO holds the wolf
    role must vary — otherwise the tier silently degrades to cheating."""
    lay = ww.game.layout
    role_idx = lay.get("role").index
    team_idx = lay.get("team").index
    minority = minority_team_code(ww)
    det = Determinizer(ww)
    _, room = _stepped_state(ww, 5, 2)
    st = room.read()
    strs = np.asarray(st["strs"])
    villagers = [p for p in range(6) if int(strs[p, team_idx]) != minority]
    assert villagers
    p0 = villagers[0]
    placements = set()
    for d in range(12):
        out = det.apply(st, p0, 6, dseed=d)
        o = np.asarray(out["strs"])
        placements.add(tuple(int(x) for x in o[:6, role_idx]))
    assert len(placements) > 1, "hidden roles never moved"


def test_search_scores_argmax_matches_search(ww):
    """The C++ scores API is the refactored core of gs_room_search — the
    ascending-order strictly-greater argmax over its totals must
    reproduce search()'s choice exactly (journaled rooms replay through
    that path)."""
    go = ww.game_overs[0]
    for seed in range(8):
        _, room = _stepped_state(ww, 50 + seed, seed % 5)
        st = room.read()
        if st["done"]:
            continue
        for pid in range(1, 7):
            c = room.search(pid, 12, 120, 1, go.team_str_slot,
                            go.team_codes, 777 + seed)
            sc = room.search_scores(pid, 12, 120, 1, go.team_str_slot,
                                    go.team_codes, 777 + seed)
            if sc is None:
                assert c == 0
                continue
            best_c, best_s, any_ = 0, 0, False
            for cand in sorted(sc):
                if not any_ or sc[cand] > best_s:
                    best_c, best_s, any_ = cand, sc[cand], True
            assert best_c == c, (seed, pid, sc, c)


def test_determinized_search_decides_and_replays(ww):
    sb = SearchBots(ww, rollouts=8, horizon=100, determinize=4)
    assert sb.ckpt_path.endswith(",det=4)")
    _, room = _stepped_state(ww, 9, 3)
    a1 = sb.native_room_actions(room, 6, seed=21)
    a2 = sb.native_room_actions(room, 6, seed=21)
    assert a1 == a2 and a1, a1
    # same deciding seats as the full-information tier (decision existence
    # reads only the searcher's own row + public state)
    full = SearchBots(ww, rollouts=8, horizon=100)
    assert set(a1) == set(full.native_room_actions(room, 6, seed=21))
    # every chosen action is one of that seat's true candidates (the
    # candidate set is public: alive targets / declared option range)
    go = ww.game_overs[0]
    for pid, c in a1.items():
        sc = room.search_scores(pid, 1, 10, 1, go.team_str_slot,
                                go.team_codes, 1)
        assert sc is not None and c in sc, (pid, c, sc)
