"""Checkpoint/resume, action-log replay, and metrics."""

import numpy as np
import pytest

from game_engine_tpu.core.engine import BatchedEngine, scripted_actions
from game_engine_tpu.core.state import init_state
from game_engine_tpu.gamespec.compile import compile_game
from game_engine_tpu.gamespec.parser import load_builtin
from game_engine_tpu.gamespec.tables import lower
from game_engine_tpu.utils import checkpoint as ckpt
from game_engine_tpu.utils import metrics as M


@pytest.fixture(scope="module")
def ww():
    return lower(compile_game(load_builtin("werewolf")))


def _states_equal(a, b):
    for fa, fb in zip(a, b):
        np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb))


def test_checkpoint_roundtrip(tmp_path, ww):
    eng = BatchedEngine(ww)
    state = init_state(ww, 4, 5, np.arange(4, dtype=np.uint32))
    for _ in range(20):
        state = eng.step(state, scripted_actions(ww, state))
    path = ckpt.save_state(str(tmp_path / "state"), state, step=20)
    restored = ckpt.load_state(path)
    _states_equal(state, restored)
    # resume: both branches must evolve identically
    s1, s2 = state, restored
    for _ in range(15):
        s1 = eng.step(s1, scripted_actions(ww, s1))
        s2 = eng.step(s2, scripted_actions(ww, s2))
    _states_equal(s1, s2)


def test_action_log_replay(ww):
    eng = BatchedEngine(ww)
    seeds = [3, 7, 11]
    state = init_state(ww, 3, 5, np.asarray(seeds, np.uint32))
    log = ckpt.ActionLog(game_name="werewolf", batch=3, n_players=[5, 5, 5], seeds=seeds)
    for _ in range(60):
        a = scripted_actions(ww, state)
        log.record(np.asarray(a))
        state = eng.step(state, a)
    replayed = ckpt.replay(ww, log)
    _states_equal(state, replayed)
    # partial replay = prefix of the run
    replayed30 = ckpt.replay(ww, log, until=30)
    assert int(replayed30.t[0]) == 30


def test_action_log_persistence(tmp_path, ww):
    log = ckpt.ActionLog(game_name="werewolf", batch=1, n_players=[4], seeds=[0])
    log.record(np.array([[0, 3, 0, 1, 0, 0, 0, 0]], np.int32))
    p = str(tmp_path / "log.json")
    log.save(p)
    loaded = ckpt.ActionLog.load(p)
    np.testing.assert_array_equal(loaded.actions_at(0, 8), log.actions_at(0, 8))


def test_tree_checkpoint(tmp_path):
    import jax

    tree = {"a": np.arange(4.0), "b": {"c": np.ones((2, 2))}}
    p = str(tmp_path / "tree")
    ckpt.save_tree(p, tree)
    out = ckpt.load_tree(p, tree)
    np.testing.assert_array_equal(np.asarray(out["b"]["c"]), tree["b"]["c"])


def test_metrics(ww):
    eng = BatchedEngine(ww)
    state = init_state(ww, 8, 5, np.arange(8, dtype=np.uint32))
    for _ in range(120):
        state = eng.step(state, scripted_actions(ww, state))
    summary = M.summarize(ww, state)
    assert summary["rooms"] == 8
    assert summary["done_rooms"] >= 1
    assert summary["wins_1"] + summary["wins_2"] == summary["done_rooms"]
    assert summary["top_phases"]
    th = M.Throughput()
    th.add(1000, 5)
    rep = th.report()
    assert rep["steps_per_sec"] > 0
