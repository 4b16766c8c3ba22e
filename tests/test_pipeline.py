"""The pipelined (1-stale) PPO learner (train/pipeline.py): exact
staleness semantics vs a hand-rolled reference loop, training signal, and
two-device placement — the rollout/update-overlap design from VERDICT r3
#8 (measured against sync data-parallel in docs/PERF.md)."""

import jax
import jax.numpy as jnp
import numpy as np

from game_engine_tpu.core.state import init_state
from game_engine_tpu.gamespec.compile import compile_game
from game_engine_tpu.gamespec.parser import load_builtin
from game_engine_tpu.gamespec.tables import lower
from game_engine_tpu.policies import net as N
from game_engine_tpu.train.pipeline import make_pipeline, run_pipelined
from game_engine_tpu.train.ppo import PPOConfig, init_training

_B, _P = 32, 6


def _setup(arch="mlp", epochs=2, horizon=8):
    lowered = lower(compile_game(load_builtin("werewolf")))
    cfg = PPOConfig(horizon=horizon, epochs=epochs,
                    net=N.NetConfig(hidden=32, arch=arch))
    key = jax.random.PRNGKey(0)
    params, opt_state, tx = init_training(lowered, cfg, key)
    state = init_state(lowered, _B, _P, np.arange(_B, dtype=np.uint32))
    return lowered, cfg, tx, params, opt_state, state, key


def _leaves_equal(a, b):
    la, lb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    return all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(la, lb))


def test_pipeline_matches_reference_staleness_loop():
    """run_pipelined(k rounds) == the hand-rolled loop where traj_{k+1}
    is collected with theta_k BEFORE the update that produces
    theta_{k+1} — bit-identical params and engine state."""
    lowered, cfg, tx, params, opt_state, state, key = _setup()
    pair = make_pipeline(lowered, cfg, tx)
    collect, update = pair

    # reference: explicit 1-stale interleave
    rp, ro, rs, rk = params, opt_state, state, key
    rs, rk, traj, lobs = collect(rp, rs, rk)
    for _ in range(3):
        nxt = collect(rp, rs, rk)
        rp, ro, _ = update(rp, ro, traj, lobs)
        rs, rk, traj, lobs = nxt

    pp, po, ps, pk, _ = run_pipelined(
        lowered, cfg, tx, params, opt_state, state, key, 3, pipeline=pair)
    assert _leaves_equal(rp, pp)
    assert _leaves_equal((rs.phase, rs.bools, rs.nums), (ps.phase, ps.bools, ps.nums))


def test_pipeline_trains():
    """Loss moves and params change under the stale pipeline (attn arch —
    the architecture this lever exists for)."""
    lowered, cfg, tx, params, opt_state, state, key = _setup(
        arch="attn", epochs=1, horizon=8)
    pp, po, ps, pk, metrics = run_pipelined(
        lowered, cfg, tx, params, opt_state, state, key, 4)
    assert np.isfinite(float(metrics["loss"]))
    assert int(metrics["episodes"]) >= 0
    assert not _leaves_equal(params, pp)


def test_pipeline_two_device_placement():
    """With distinct actor/learner devices the stages run on their own
    devices (the CPU-mesh stand-in for a 2-chip actor/learner split) and
    produce the same math as the single-device pipeline."""
    if jax.device_count() < 2:
        import pytest

        pytest.skip("needs >=2 devices")
    lowered, cfg, tx, params, opt_state, state, key = _setup()
    d0, d1 = jax.devices()[0], jax.devices()[1]
    p1, *_ = run_pipelined(lowered, cfg, tx, params, opt_state, state, key, 2)
    p2, *_ = run_pipelined(lowered, cfg, tx, params, opt_state, state, key, 2,
                           actor_device=d0, learner_device=d1)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


def test_disaggregated_submesh_pipeline_matches_single_device():
    """4 actor chips collect SPMD while 4 learner chips update — the scale
    form of the actor/learner split. Same math as the single-device
    pipeline to float-reduction tolerance, same episode count."""
    import numpy as np

    from game_engine_tpu.train.pipeline import (run_pipelined,
                                                run_pipelined_sharded,
                                                submeshes)

    lowered, cfg, tx, params, opt_state, state, key = _setup(horizon=4)
    am, lm = submeshes(4, 4)
    p1, _, _, _, m1 = run_pipelined_sharded(
        lowered, cfg, tx, params, opt_state, state, key, 3, am, lm)
    p0, _, _, _, m0 = run_pipelined(
        lowered, cfg, tx, params, opt_state, state, key, 3)
    assert int(m1["episodes"]) == int(m0["episodes"])
    assert abs(float(m1["loss"]) - float(m0["loss"])) < 1e-3
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p0)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32), atol=5e-4)
