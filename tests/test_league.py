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
    lg = League(max_size=3, snapshot_every=2)
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
    lg = League(snapshot_every=1)
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
