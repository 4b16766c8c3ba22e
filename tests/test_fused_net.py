"""Fused Pallas policy-net kernels (policies/fused.py) vs the XLA
apply_net: forward closeness, gradient closeness through the real PPO
loss, pad-path coverage, and a fused end-to-end train step. Runs in
Pallas interpret mode on the CPU test platform (fused._interpret)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from game_engine_tpu.core.state import init_state
from game_engine_tpu.gamespec.compile import compile_game
from game_engine_tpu.gamespec.parser import load_builtin
from game_engine_tpu.gamespec.tables import lower
from game_engine_tpu.policies import fused as FZ
from game_engine_tpu.policies import net as N
from game_engine_tpu.train.ppo import (PPOConfig, gae, init_training,
                                       make_train_step, ppo_loss)
from game_engine_tpu.train.pipeline import make_pipeline


@pytest.fixture(scope="module")
def ww_lowered():
    return lower(compile_game(load_builtin("werewolf")))


def _setup(ww_lowered, arch, hidden=64, layers=2):
    cfg = N.NetConfig(hidden=hidden, layers=layers, arch=arch)
    params = N.init_params(
        jax.random.PRNGKey(0), N.obs_dim(ww_lowered),
        N.action_space(ww_lowered), cfg, ww_lowered)
    return cfg, params


@pytest.mark.parametrize("arch", ["attn", "deepsets"])
def test_fused_forward_matches_xla(ww_lowered, arch):
    cfg, params = _setup(ww_lowered, arch)
    apply = FZ.make_apply(ww_lowered, cfg)
    # 37 rooms * 8 seats = 296 rows: not a BLOCK_ROWS multiple (pad path)
    obs = jax.random.normal(
        jax.random.PRNGKey(1), (37, ww_lowered.P, N.obs_dim(ww_lowered)),
        jnp.float32).astype(jnp.bfloat16)
    l0, v0 = N.apply_net(params, obs, cfg, ww_lowered)
    l1, v1 = apply(params, obs)
    assert l1.shape == l0.shape and v1.shape == v0.shape
    scale = float(jnp.max(jnp.abs(l0))) + 1e-6
    assert float(jnp.max(jnp.abs(l0 - l1))) / scale < 2e-2
    vscale = float(jnp.max(jnp.abs(v0))) + 1e-6
    assert float(jnp.max(jnp.abs(v0 - v1))) / vscale < 2e-2


def test_fused_grads_match_through_ppo_loss(ww_lowered):
    """Param grads of the REAL ppo_loss: fused kernels vs the remat'd XLA
    path, on a genuine collected trajectory."""
    cfg_x = PPOConfig(horizon=6, epochs=1, net=N.NetConfig(hidden=64, arch="attn"))
    cfg_f = PPOConfig(horizon=6, epochs=1, fused_net=True,
                      net=N.NetConfig(hidden=64, arch="attn"))
    params, opt_state, tx = init_training(ww_lowered, cfg_x, jax.random.PRNGKey(0))
    state = init_state(ww_lowered, 12, 6, np.arange(12, dtype=np.uint32))
    collect, _ = make_pipeline(ww_lowered, cfg_x, tx)
    state, key, traj, last_obs = collect(params, state, jax.random.PRNGKey(2))
    _, last_v = N.apply_net(params, last_obs, cfg_x.net, ww_lowered)
    adv, ret = gae(traj, last_v, cfg_x)

    g_x = jax.grad(lambda p: ppo_loss(p, traj, adv, ret, cfg_x, ww_lowered)[0])(params)
    g_f = jax.grad(lambda p: ppo_loss(p, traj, adv, ret, cfg_f, ww_lowered)[0])(params)
    for k in g_x:
        a, b = np.asarray(g_x[k]), np.asarray(g_f[k])
        denom = np.abs(a).max() + 1e-6
        assert np.abs(a - b).max() / denom < 5e-2, (
            f"{k}: fused grad diverges {np.abs(a - b).max() / denom:.3e}")


def test_fused_train_step_runs(ww_lowered):
    """One fused end-to-end update (unroll + loss + adam) produces finite
    metrics and actually moves the params."""
    cfg = PPOConfig(horizon=4, epochs=1, fused_net=True,
                    net=N.NetConfig(hidden=64, arch="attn"))
    params, opt_state, tx = init_training(ww_lowered, cfg, jax.random.PRNGKey(0))
    before = jax.tree_util.tree_map(np.asarray, params)
    state = init_state(ww_lowered, 8, 6, np.arange(8, dtype=np.uint32))
    step = jax.jit(make_train_step(ww_lowered, cfg, tx))
    params, opt_state, state, key, metrics = step(
        params, opt_state, state, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    moved = any(
        np.abs(np.asarray(params[k]) - before[k]).max() > 0
        for k in before)
    assert moved


def test_fused_league_step_runs(ww_lowered):
    """One fused LEAGUE update (frozen-opponent unroll rides the fused
    per-step forward, loss rides the fused whole-trajectory pass)."""
    from game_engine_tpu.train.league import make_league_train_step

    cfg = PPOConfig(horizon=4, epochs=1, fused_net=True,
                    net=N.NetConfig(hidden=64, arch="attn"))
    params, opt_state, tx = init_training(ww_lowered, cfg, jax.random.PRNGKey(0))
    opp = jax.tree_util.tree_map(jnp.copy, params)
    before = jax.tree_util.tree_map(np.asarray, params)
    state = init_state(ww_lowered, 8, 6, np.arange(8, dtype=np.uint32))
    step = jax.jit(make_league_train_step(ww_lowered, cfg, tx))
    params, opt_state, state, key, metrics = step(
        params, opp, opt_state, state, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert 0.0 <= float(metrics["learner_win_rate"]) <= 1.0
    moved = any(
        np.abs(np.asarray(params[k]) - before[k]).max() > 0
        for k in before)
    assert moved


def test_supports_gating(ww_lowered):
    assert FZ.supports(ww_lowered, N.NetConfig(arch="attn"))
    assert FZ.supports(ww_lowered, N.NetConfig(arch="deepsets"))
    assert not FZ.supports(ww_lowered, N.NetConfig(arch="mlp"))
    assert not FZ.supports(ww_lowered, N.NetConfig(arch="attn", attn_heads=4))


def test_monolithic_loss_vg_matches_value_and_grad(ww_lowered):
    """The one-pass loss-grad kernel (fused.make_loss_vg): loss, metrics
    and param grads must match jax.value_and_grad over the XLA ppo_loss
    on a genuine trajectory (pad path: 12 rooms -> 576 rows)."""
    cfg_x = PPOConfig(horizon=6, epochs=1,
                      net=N.NetConfig(hidden=64, arch="attn"))
    params, opt_state, tx = init_training(ww_lowered, cfg_x,
                                          jax.random.PRNGKey(0))
    state = init_state(ww_lowered, 12, 6, np.arange(12, dtype=np.uint32))
    collect, _ = make_pipeline(ww_lowered, cfg_x, tx)
    state, key, traj, last_obs = collect(params, state, jax.random.PRNGKey(2))
    _, last_v = N.apply_net(params, last_obs, cfg_x.net, ww_lowered)
    adv, ret = gae(traj, last_v, cfg_x)

    (l_x, m_x), g_x = jax.value_and_grad(
        lambda p: ppo_loss(p, traj, adv, ret, cfg_x, ww_lowered),
        has_aux=True)(params)
    mono = FZ.make_loss_vg(ww_lowered, cfg_x.net, cfg_x.clip,
                           cfg_x.vf_coef, cfg_x.ent_coef)
    (l_f, m_f), g_f = mono(params, traj.obs, traj.legal, traj.actions,
                           traj.logp, adv, ret, traj.mask)
    assert abs(float(l_x) - float(l_f)) / (abs(float(l_x)) + 1e-6) < 2e-2
    for k in ("pg_loss", "v_loss", "entropy", "ratio_mean"):
        assert abs(float(m_x[k]) - float(m_f[k])) < 5e-2, (
            k, float(m_x[k]), float(m_f[k]))
    for k in g_x:
        a, b = np.asarray(g_x[k]), np.asarray(g_f[k])
        denom = np.abs(a).max() + 1e-6
        assert b.shape == a.shape
        assert np.abs(a - b).max() / denom < 5e-2, (
            f"{k}: monolithic grad diverges "
            f"{np.abs(a - b).max() / denom:.3e}")


def test_monolithic_train_step_runs(ww_lowered):
    """make_train_step with fused_loss=True (the default fused path) runs
    end-to-end and moves params; fused_loss=False keeps the two-pass
    path alive for A/B."""
    for fl in (True, False):
        cfg = PPOConfig(horizon=4, epochs=1, fused_net=True, fused_loss=fl,
                        net=N.NetConfig(hidden=64, arch="deepsets"))
        params, opt_state, tx = init_training(ww_lowered, cfg,
                                              jax.random.PRNGKey(0))
        before = jax.tree_util.tree_map(np.asarray, params)
        state = init_state(ww_lowered, 8, 6, np.arange(8, dtype=np.uint32))
        step = jax.jit(make_train_step(ww_lowered, cfg, tx))
        params, opt_state, state, key, metrics = step(
            params, opt_state, state, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"])), fl
        moved = any(
            np.abs(np.asarray(params[k]) - before[k]).max() > 0
            for k in before)
        assert moved, fl
