"""League self-play: pool management + one league train step end-to-end."""

import jax
import numpy as np
import pytest

from game_engine_tpu.core.state import init_state
from game_engine_tpu.gamespec.compile import compile_game
from game_engine_tpu.gamespec.parser import load_builtin
from game_engine_tpu.gamespec.tables import lower
from game_engine_tpu.policies import net as N
from game_engine_tpu.train.league import League, make_league_train_step
from game_engine_tpu.train.ppo import PPOConfig, init_training


@pytest.fixture(scope="module")
def ww():
    return lower(compile_game(load_builtin("werewolf")))


def test_league_pool_management():
    lg = League(max_size=3, snapshot_every=2, anchor=False)
    p = {"w": np.ones(2)}
    snaps = [lg.maybe_snapshot(p) for _ in range(8)]
    assert snaps == [True, False, True, False, True, False, True, False]
    assert len(lg.params_pool) == 3  # capped
    ids = lg.ids()
    assert ids == [1, 2, 3], ids  # id 0 evicted; ids are STABLE, not positions
    rng = np.random.default_rng(0)
    sid, opp = lg.sample_opponent(rng)
    assert sid in ids
    # losing opponents get sampled more
    for _ in range(20):
        lg.record_result(ids[0], 0.0)  # learner always loses to this one
        lg.record_result(ids[1], 1.0)
        lg.record_result(ids[2], 1.0)
    counts = {i: 0 for i in ids}
    for _ in range(300):
        i, _ = lg.sample_opponent(rng)
        counts[i] += 1
    assert counts[ids[0]] > counts[ids[1]] and counts[ids[0]] > counts[ids[2]]
    # a result for an evicted id is dropped, not misapplied
    lg.record_result(0, 1.0)
    assert lg.ids() == ids


def test_league_train_step(ww):
    cfg = PPOConfig(horizon=6, epochs=2, net=N.NetConfig(hidden=32, layers=1))
    params, opt_state, tx = init_training(ww, cfg, jax.random.PRNGKey(0))
    lg = League(snapshot_every=1, anchor=False)
    lg.maybe_snapshot(params)
    train = jax.jit(make_league_train_step(ww, cfg, tx))
    state = init_state(ww, 8, 5, np.arange(8, dtype=np.uint32))
    key = jax.random.PRNGKey(1)
    rng = np.random.default_rng(2)
    for u in range(3):
        idx, opp = lg.sample_opponent(rng)
        params, opt_state, state, key, metrics = train(params, opp, opt_state, state, key)
        lg.record_result(idx, float(metrics["learner_win_rate"]))
        lg.maybe_snapshot(params)
    assert np.isfinite(float(metrics["loss"]))
    assert 0.0 <= float(metrics["learner_win_rate"]) <= 1.0
    assert len(lg.params_pool) >= 2


def test_league_anchor_sampling():
    """The scripted anchor stays in the draw forever, its weight rises as
    the learner loses to it, and it never counts against max_size."""
    lg = League(max_size=2, snapshot_every=1)  # anchor defaults ON
    p = {"w": np.ones(2)}
    for _ in range(5):
        lg.maybe_snapshot(p)
    assert len(lg.params_pool) == 2  # anchor not in the snapshot pool
    rng = np.random.default_rng(0)
    # learner crushes every snapshot but RESIGNS vs scripted: the anchor
    # must dominate the draw (the anti-resignation mechanism)
    for _ in range(30):
        for sid in lg.ids():
            lg.record_result(sid, 1.0)
        lg.record_result(League.ANCHOR_ID, 0.0)
    hits = sum(
        1 for _ in range(200)
        if lg.sample_opponent(rng)[0] == League.ANCHOR_ID)
    assert hits > 150, hits
    anchor_params = [o for i, o in (lg.sample_opponent(rng) for _ in range(50))
                     if i == League.ANCHOR_ID]
    assert anchor_params and all(o is None for o in anchor_params)


def test_league_anchor_step(ww):
    """The scripted-opponent league program trains end-to-end."""
    cfg = PPOConfig(horizon=6, epochs=1, net=N.NetConfig(hidden=32, layers=1))
    params, opt_state, tx = init_training(ww, cfg, jax.random.PRNGKey(0))
    train = jax.jit(make_league_train_step(ww, cfg, tx, scripted_opponent=True))
    state = init_state(ww, 8, 5, np.arange(8, dtype=np.uint32))
    before = jax.tree_util.tree_map(np.asarray, params)
    params, opt_state, state, key, metrics = train(
        params, params, opt_state, state, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["entropy"]))
    assert any(np.abs(np.asarray(params[k]) - before[k]).max() > 0 for k in before)


def test_elo_fit_recovers_synthetic_ratings():
    """elo_fit on a matrix generated from known ratings + a minority-side
    handicap recovers the ordering, the gaps, and the handicap."""
    from game_engine_tpu.train.evaluate import elo_fit

    true_elo = {"a": 200.0, "b": 0.0, "c": -200.0}
    side = -120.0  # minority side is structurally disadvantaged
    k = np.log(10.0) / 400.0
    table = {
        r: {
            c: float(1.0 / (1.0 + np.exp(-k * (true_elo[r] - true_elo[c] + side))))
            for c in true_elo
        }
        for r in true_elo
    }
    fit = elo_fit(table)
    assert list(fit["ratings"]) == ["a", "b", "c"]
    assert abs(fit["minority_side_elo"] - side) < 15.0
    for name, want in true_elo.items():
        assert abs(fit["ratings"][name] - want) < 15.0, (name, fit)
