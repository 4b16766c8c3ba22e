"""PPO self-play smoke tests + multi-chip sharding tests (8 virtual CPU
devices, SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from game_engine_tpu.core.state import init_state
from game_engine_tpu.gamespec.compile import compile_game
from game_engine_tpu.gamespec.parser import load_builtin
from game_engine_tpu.gamespec.tables import lower
from game_engine_tpu.parallel.mesh import make_mesh, params_sharding, replicate, state_sharding
from game_engine_tpu.policies import net as N
from game_engine_tpu.train.ppo import PPOConfig, init_training, make_train_step, terminal_rewards


@pytest.fixture(scope="module")
def ww_lowered():
    return lower(compile_game(load_builtin("werewolf")))


def test_observe_and_mask_shapes(ww_lowered):
    state = init_state(ww_lowered, 4, 5, np.arange(4, dtype=np.uint32))
    obs = N.observe(ww_lowered, state)
    assert obs.shape == (4, 8, N.obs_dim(ww_lowered))
    mask = N.legal_action_mask(ww_lowered, state)
    assert mask.shape == (4, 8, N.action_space(ww_lowered))


def test_policy_actions_are_legal(ww_lowered):
    """Sampled actions in an action phase must always be accepted by the
    engine for targeted players (the mask encodes P2 exactly)."""
    from game_engine_tpu.core.engine import BatchedEngine

    eng = BatchedEngine(ww_lowered)
    state = init_state(ww_lowered, 8, 5, np.arange(8, dtype=np.uint32))
    cfg = N.NetConfig(hidden=32, layers=1)
    params = N.init_params(
        jax.random.PRNGKey(0), N.obs_dim(ww_lowered), N.action_space(ww_lowered), cfg
    )
    key = jax.random.PRNGKey(1)
    for t in range(30):
        key, sk = jax.random.split(key)
        a, logp, v, _ = N.sample_actions(ww_lowered, params, state, sk, cfg)
        from game_engine_tpu.train.ppo import actor_mask

        am = actor_mask(ww_lowered, state)
        prev_phase = state.phase
        state = eng.step(state, jnp.where(am, a, 0))
        # every masked emission must have been accepted: either acted is now
        # set, or the phase completed and transitioned (acted resets then)
        transitioned = np.asarray(state.phase != prev_phase)[:, None]
        accepted = np.asarray(state.acted) | ~np.asarray(am) | transitioned
        assert accepted.all(), f"t={t}: policy emitted an illegal action"


def test_train_step_runs_and_updates(ww_lowered):
    cfg = PPOConfig(horizon=8, net=N.NetConfig(hidden=32, layers=1))
    params, opt_state, tx = init_training(ww_lowered, cfg, jax.random.PRNGKey(0))
    train_step = jax.jit(make_train_step(ww_lowered, cfg, tx))
    state = init_state(ww_lowered, 16, 5, np.arange(16, dtype=np.uint32))
    key = jax.random.PRNGKey(7)
    p0 = jax.tree_util.tree_map(lambda x: x.copy(), params)
    for _ in range(3):
        params, opt_state, state, key, metrics = train_step(params, opt_state, state, key)
    assert np.isfinite(float(metrics["loss"]))
    changed = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), p0, params
    )
    assert max(jax.tree_util.tree_leaves(changed)) > 0


def test_terminal_rewards_team(ww_lowered):
    from game_engine_tpu.core.engine import BatchedEngine, scripted_actions

    eng = BatchedEngine(ww_lowered)
    state = init_state(ww_lowered, 4, 5, np.arange(4, dtype=np.uint32))
    for _ in range(200):
        state = eng.step(state, scripted_actions(ww_lowered, state))
        if bool(state.done.all()):
            break
    assert bool(state.done.all())
    r = np.asarray(terminal_rewards(ww_lowered, state, state.done))
    team_slot = ww_lowered.game.layout.slot("team")
    teams = np.asarray(state.strs[..., team_slot.index])
    for b in range(4):
        w = int(state.winner[b])
        assert w in (1, 2)
        # winners +1, losers -1, zero-sum over teams
        for p in range(5):
            expected = 1.0 if (w == 1) == (teams[b, p] == team_slot.encode("werewolves")) else -1.0
            assert r[b, p] == expected


def test_multichip_rollout_parity(ww_lowered):
    """Sharding rooms over 8 devices must not change results vs single-device."""
    from game_engine_tpu.core.engine import scripted_actions
    from game_engine_tpu.core.step import make_step

    step = jax.jit(make_step(ww_lowered))
    B = 16
    state1 = init_state(ww_lowered, B, 5, np.arange(B, dtype=np.uint32))
    state2 = init_state(ww_lowered, B, 5, np.arange(B, dtype=np.uint32))
    mesh = make_mesh(8, model_parallel=1)
    state2 = state_sharding(mesh, state2)
    for _ in range(60):
        a1 = scripted_actions(ww_lowered, state1)
        a2 = scripted_actions(ww_lowered, state2)
        state1 = step(state1, a1)
        state2 = step(state2, a2)
    for f1, f2 in zip(state1, state2):
        np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))


def test_multichip_train_step(ww_lowered):
    """Full dp+tp PPO train step over a (4, 2) mesh."""
    cfg = PPOConfig(horizon=4, net=N.NetConfig(hidden=64, layers=2))
    params, opt_state, tx = init_training(ww_lowered, cfg, jax.random.PRNGKey(0))
    train_step = make_train_step(ww_lowered, cfg, tx)
    mesh = make_mesh(8, model_parallel=2)
    state = init_state(ww_lowered, 16, 5, np.arange(16, dtype=np.uint32))
    with mesh:
        state = state_sharding(mesh, state)
        params = params_sharding(mesh, params)
        opt_state = replicate(mesh, opt_state)
        key = replicate(mesh, jax.random.PRNGKey(3))
        params, opt_state, state, key, metrics = jax.jit(train_step)(
            params, opt_state, state, key
        )
        assert np.isfinite(float(metrics["loss"]))


def test_deepsets_arch_trains_and_acts(ww_lowered):
    """The seat-set encoder (phi pooled over targets + pointer head): params
    init, legal sampling, and a few train updates with finite loss. The
    trunk width is P-independent — the arch that scales to big rooms."""
    import math

    import numpy as np

    from game_engine_tpu.core.state import init_state
    from game_engine_tpu.policies import net as N
    from game_engine_tpu.train.ppo import PPOConfig, init_training, make_train_step

    cfg = PPOConfig(horizon=6, epochs=2,
                    net=N.NetConfig(hidden=64, layers=2, arch="deepsets"))
    params, opt_state, tx = init_training(ww_lowered, cfg, jax.random.PRNGKey(0))
    assert "w_phi0" in params and "w_ptr" in params
    state = init_state(ww_lowered, 16, 6, np.arange(16, dtype=np.uint32))
    a, logp, v, legal = N.sample_actions(
        ww_lowered, params, state, jax.random.PRNGKey(1), cfg.net)
    assert a.shape == (16, ww_lowered.P)
    # sampled actions are always legal (the mask guards the pointer head too)
    aoh = jax.nn.one_hot(a - 1, legal.shape[-1], dtype=bool)
    assert bool(jnp.all(jnp.any(aoh & legal, axis=-1)))

    train = jax.jit(make_train_step(ww_lowered, cfg, tx))
    key = jax.random.PRNGKey(2)
    before = jax.tree_util.tree_map(jnp.copy, params)
    for _ in range(2):
        params, opt_state, state, key, m = train(params, opt_state, state, key)
    assert math.isfinite(float(m["loss"]))
    moved = any(
        float(jnp.max(jnp.abs(params[k] - before[k]))) > 0 for k in params
    )
    assert moved, "deepsets params never updated"


def test_deepsets_params_transfer_across_room_sizes():
    """Every deepsets param shape is room-size independent: params built
    for the 8-player compile act unchanged on a 12-player compile (the
    ROADMAP cross-room-size transfer item)."""
    import numpy as np

    from game_engine_tpu.core.state import init_state
    from game_engine_tpu.gamespec.compile import GameConfig, compile_game
    from game_engine_tpu.gamespec.parser import load_builtin
    from game_engine_tpu.gamespec.tables import lower
    from game_engine_tpu.policies import net as N

    cfg = N.NetConfig(hidden=64, layers=2, arch="deepsets")
    small = lower(compile_game(load_builtin("werewolf")))  # P=8
    params = N.init_params(jax.random.PRNGKey(0), N.obs_dim(small),
                           N.action_space(small), cfg, small)
    big = lower(compile_game(load_builtin("werewolf"), GameConfig(max_players=12)))
    big_params = N.init_params(jax.random.PRNGKey(0), N.obs_dim(big),
                               N.action_space(big), cfg, big)
    assert jax.tree_util.tree_map(jnp.shape, params) == \
        jax.tree_util.tree_map(jnp.shape, big_params)

    # the SAME 8-player-trained params act on a 12-player room
    state = init_state(big, 8, 12, np.arange(8, dtype=np.uint32))
    logits, value = N.apply_net(params, N.observe(big, state), cfg, big)
    assert logits.shape == (8, 12, N.action_space(big))
    assert value.shape == (8, 12)
    a, logp, v, legal = N.sample_actions(big, params, state,
                                         jax.random.PRNGKey(1), cfg)
    aoh = jax.nn.one_hot(a - 1, legal.shape[-1], dtype=bool)
    assert bool(jnp.all(jnp.any(aoh & legal, axis=-1)))


def test_team_masks_ffa_protagonist_seat():
    """Free-for-all score games (no teams, no speaker) eval the learned
    policy as SEAT 1 vs a scripted field — winner==1 is exactly seat 1's
    victory in score mode, so cross-play win rates are meaningful."""
    from game_engine_tpu.train.run import team_masks

    ffa = lower(compile_game(load_builtin("auction-house")))
    state = init_state(ffa, 3, 5, np.arange(3, dtype=np.uint32))
    m = np.asarray(team_masks(ffa, state))
    assert m[:, 0].all() and not m[:, 1:].any()

    # team games keep the minority-team mask (werewolf: the wolves)
    ww = lower(compile_game(load_builtin("werewolf")))
    st = init_state(ww, 2, 6, np.arange(2, dtype=np.uint32))
    from game_engine_tpu.core.engine import BatchedEngine, scripted_actions

    eng = BatchedEngine(ww)
    for _ in range(3):  # role assignment happens on entering phase 1
        st = eng.step(st, scripted_actions(ww, st))
    mw = np.asarray(team_masks(ww, st))
    assert 0 < mw.sum() < mw.size  # some wolves, not everyone


def test_attn_arch_trains_and_transfers(ww_lowered):
    """'attn' = deepsets + one residual self-attention block over the seat
    axis: params init (all room-size independent), legal sampling, finite
    train updates, and 8-player params acting on a 12-player compile."""
    import math

    from game_engine_tpu.gamespec.compile import GameConfig

    cfg = PPOConfig(horizon=6, epochs=2,
                    net=N.NetConfig(hidden=64, layers=2, arch="attn"))
    params, opt_state, tx = init_training(ww_lowered, cfg, jax.random.PRNGKey(0))
    assert "w_qkv" in params and "w_ptr" in params
    state = init_state(ww_lowered, 16, 6, np.arange(16, dtype=np.uint32))
    a, logp, v, legal = N.sample_actions(
        ww_lowered, params, state, jax.random.PRNGKey(1), cfg.net)
    aoh = jax.nn.one_hot(a - 1, legal.shape[-1], dtype=bool)
    assert bool(jnp.all(jnp.any(aoh & legal, axis=-1)))

    train = jax.jit(make_train_step(ww_lowered, cfg, tx))
    key = jax.random.PRNGKey(2)
    before = jax.tree_util.tree_map(jnp.copy, params)
    for _ in range(2):
        params, opt_state, state, key, m = train(params, opt_state, state, key)
    assert math.isfinite(float(m["loss"]))
    assert any(float(jnp.max(jnp.abs(params[k] - before[k]))) > 0
               for k in params)

    # room-size transfer, like deepsets
    big = lower(compile_game(load_builtin("werewolf"), GameConfig(max_players=12)))
    st = init_state(big, 4, 12, np.arange(4, dtype=np.uint32))
    logits, value = N.apply_net(params, N.observe(big, st), cfg.net, big)
    assert logits.shape == (4, 12, N.action_space(big))


def test_shipped_attn_checkpoint_if_present(ww_lowered):
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "docs",
                        "checkpoints", "attn_werewolf_u120.npz")
    if not os.path.exists(path):
        pytest.skip("no shipped attn checkpoint")
    from game_engine_tpu.utils.checkpoint import load_tree

    cfg = PPOConfig(net=N.NetConfig(hidden=256, arch="attn"))
    params, _, _ = init_training(ww_lowered, cfg, jax.random.PRNGKey(0))
    params = load_tree(path[:-4], params)
    state = init_state(ww_lowered, 8, 6, np.arange(8, dtype=np.uint32))
    a, logp, v, legal = N.sample_actions(ww_lowered, params, state,
                                         jax.random.PRNGKey(1), cfg.net)
    aoh = jax.nn.one_hot(a - 1, legal.shape[-1], dtype=bool)
    assert bool(jnp.all(jnp.any(aoh & legal, axis=-1)))


def test_loss_chunk_invariance(ww_lowered):
    # PPOConfig.loss_chunk only changes HOW the deepsets/attn loss recompute
    # is chunked over T (memory vs dispatch trade, docs/PERF.md) — the loss
    # and gradients must not move. chunk=3 with T=8 falls back to the
    # largest divisor (2).
    from game_engine_tpu.train.ppo import gae, make_unroll, ppo_loss

    cfg = PPOConfig(horizon=8, net=N.NetConfig(hidden=32, layers=1, arch="attn"))
    params, _, _ = init_training(ww_lowered, cfg, jax.random.PRNGKey(0))
    state = init_state(ww_lowered, 8, 5, np.arange(8, dtype=np.uint32))
    unroll = jax.jit(make_unroll(ww_lowered, cfg))
    state, _, traj = unroll(params, state, jax.random.PRNGKey(3))
    _, last_v = N.apply_net(params, N.observe(ww_lowered, state), cfg.net,
                            ww_lowered)
    adv, ret = gae(traj, last_v, cfg)

    outs = {}
    for chunk in (1, 2, 3, 8):
        c = PPOConfig(horizon=8, loss_chunk=chunk,
                      net=N.NetConfig(hidden=32, layers=1, arch="attn"))
        (loss, _), grads = jax.value_and_grad(ppo_loss, has_aux=True)(
            params, traj, adv, ret, c, ww_lowered)
        outs[chunk] = (float(loss), grads)
    base_loss, base_grads = outs[1]
    for chunk in (2, 3, 8):
        loss, grads = outs[chunk]
        assert abs(loss - base_loss) < 1e-4 * max(1.0, abs(base_loss))
        for k in base_grads:
            np.testing.assert_allclose(
                np.asarray(grads[k], np.float32),
                np.asarray(base_grads[k], np.float32),
                rtol=2e-3, atol=2e-4, err_msg=f"chunk={chunk} grad {k}")


# -- round-4 review fixes: observation information rules ----------------------


def test_day_vote_writes_are_public(ww_lowered):
    """A phase selecting actors by PUBLIC fields (can_vote/is_alive) keeps
    its recorded bookkeeping public; the old Const-only carve-out masked
    even day-vote writes VIS_SELF."""
    from game_engine_tpu.policies.net import (
        VIS_PUBLIC, VIS_SELF, field_visibility)

    vis = field_visibility(ww_lowered)
    assert vis.get("vote_choice", VIS_PUBLIC) == VIS_PUBLIC, \
        "day-vote bookkeeping masked self-only"
    # night bookkeeping stays private (selected by hidden role)
    assert vis.get("selected_target_id") == VIS_SELF


def test_revealed_role_visible_to_all(ww_lowered):
    """P15: once a seat's reveal flag is set, its role one-hot must be
    visible to every viewer (the lynched player's role is announced)."""
    import numpy as np

    from game_engine_tpu.core.state import init_state
    from game_engine_tpu.policies import net as N

    state = init_state(ww_lowered, 1, 5, np.uint32(0))
    lay = ww_lowered.game.layout
    role_slot = lay.slot("role")
    rev_slot = lay.bool_index("role_revealed")
    # give seat 2 a role code and flip its reveal flag
    strs = state.strs.at[0, 1, role_slot.index].set(2)
    bools = state.bools.at[0, 1, rev_slot].set(True)
    state = state._replace(strs=strs, bools=bools)
    obs = np.asarray(N.observe(ww_lowered, state, masked=True))
    # locate seat 2's role one-hot inside viewer 0's (non-teammate) row
    per = N._per_player_dim(ww_lowered)
    # offset of the role block within a player's feature slice
    off = 0
    for f in N._obs_fields(ww_lowered):
        s = lay.slot(f.name)
        w = 1 if s.bank in ("bool", "num") else max(2, len(s.vocab))
        if f.name == "role":
            break
        off += w
    viewer0_seat2 = obs[0, 0, per * 1 + off: per * 1 + off + max(2, len(role_slot.vocab))]
    assert viewer0_seat2.sum() > 0, "revealed role still masked to others"
