"""Learned bot policy: per-player actor-critic heads over room observations.

Replaces the scripted policy for PPO/league self-play (BASELINE.json configs
4-5). The reference has no learned policies — bots are LLM calls (reference:
agent/game_agent_v2.py:468-617); this is the TPU-native substitute: a shared
MLP trunk with tensor-parallel-shardable hidden layers, producing per-player
action logits over the unified choice space {1..P targets / options} plus a
value head.

Observation design (``obs_dim`` static per compiled game):
  per player: [bool bank, num bank (scaled), one-hot str banks,
               phase one-hot, acted flag, alive-count fraction]
Hidden-role information is included (centralized training, self-play); a
masked "public view" variant can be derived from view/project.py later.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from game_engine_tpu.core.state import GameState
from game_engine_tpu.core.step import _alive
from game_engine_tpu.gamespec.tables import Lowered


def _per_player_dim(lowered: Lowered) -> int:
    lay = lowered.game.layout
    str_onehot = sum(max(2, len(s.vocab)) for s in lay.slots.values() if s.bank == "str")
    return lay.n_bool + lay.n_num + str_onehot + 2  # + acted + alive


def obs_dim(lowered: Lowered) -> int:
    P = lowered.P
    # full-room view (centralized self-play) + viewer one-hot + phase + count
    return P * _per_player_dim(lowered) + P + lowered.NP + 1


def observe(lowered: Lowered, state: GameState) -> jax.Array:
    """(B, P, F) float32 — each player sees the FULL room state plus their
    own identity one-hot (centralized-training self-play observation).

    Without the full-room view a policy cannot express even basic play
    (a werewolf can't see which target is a teammate); hidden-information
    variants can mask columns via the audience rules later.
    """
    B, P = state.present.shape
    lay = lowered.game.layout
    parts = [state.bools.astype(jnp.float32), state.nums.astype(jnp.float32) / float(P)]
    for s in lay.slots.values():
        if s.bank == "str":
            width = max(2, len(s.vocab))
            parts.append(jax.nn.one_hot(state.strs[..., s.index], width, dtype=jnp.float32))
    alive = _alive(lowered, state)
    parts.append(state.acted.astype(jnp.float32)[..., None])
    parts.append(alive.astype(jnp.float32)[..., None])
    per_player = jnp.concatenate(parts, axis=-1)  # (B, P, F0)
    room = jnp.broadcast_to(
        per_player.reshape(B, 1, -1), (B, P, P * per_player.shape[-1])
    )
    viewer = jnp.broadcast_to(jnp.eye(P, dtype=jnp.float32)[None], (B, P, P))
    phase_oh = jnp.broadcast_to(
        jax.nn.one_hot(state.phase, lowered.NP, dtype=jnp.float32)[:, None, :],
        (B, P, lowered.NP),
    )
    n_alive = jnp.broadcast_to(
        (jnp.sum(alive, axis=1).astype(jnp.float32) / P)[:, None, None], (B, P, 1)
    )
    return jnp.concatenate([room, viewer, phase_oh, n_alive], axis=-1)


def action_space(lowered: Lowered) -> int:
    """Unified discrete choice space: 1..A (0 reserved for no-op)."""
    return max(lowered.P, int(lowered.choice_max.max()) if lowered.choice_max.size else 0)


@dataclasses.dataclass(frozen=True)
class NetConfig:
    hidden: int = 256
    layers: int = 2


def init_params(key, in_dim: int, n_actions: int, cfg: NetConfig) -> dict[str, Any]:
    """Plain-pytree MLP params; hidden layers sized for tensor-parallel
    sharding over a 'model' mesh axis (see parallel/mesh.py)."""
    params = {}
    dims = [in_dim] + [cfg.hidden] * cfg.layers
    keys = jax.random.split(key, cfg.layers + 2)
    for i in range(cfg.layers):
        scale = 1.0 / np.sqrt(dims[i])
        params[f"w{i}"] = jax.random.normal(keys[i], (dims[i], dims[i + 1]), jnp.float32) * scale
        params[f"b{i}"] = jnp.zeros((dims[i + 1],), jnp.float32)
    scale = 1.0 / np.sqrt(cfg.hidden)
    params["w_pi"] = jax.random.normal(keys[-2], (cfg.hidden, n_actions), jnp.float32) * scale
    params["b_pi"] = jnp.zeros((n_actions,), jnp.float32)
    params["w_v"] = jax.random.normal(keys[-1], (cfg.hidden, 1), jnp.float32) * scale
    params["b_v"] = jnp.zeros((1,), jnp.float32)
    return params


def apply_net(params: dict[str, Any], obs: jax.Array, cfg: NetConfig):
    """obs (..., F) -> (logits (..., A), value (...,)). bfloat16 matmuls on
    the MXU with float32 accumulation (preferred_element_type)."""
    x = obs.astype(jnp.bfloat16)
    i = 0
    while f"w{i}" in params:
        x = jnp.dot(x, params[f"w{i}"].astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        x = jax.nn.gelu(x + params[f"b{i}"])
        x = x.astype(jnp.bfloat16)
        i += 1
    logits = jnp.dot(x, params["w_pi"].astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    logits = logits + params["b_pi"]
    value = jnp.dot(x, params["w_v"].astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    value = (value + params["b_v"])[..., 0]
    return logits, value


def legal_action_mask(lowered: Lowered, state: GameState) -> jax.Array:
    """(B, P, A) bool — which choices the engine would accept (P2), so the
    policy never wastes probability mass on rejected actions."""
    from game_engine_tpu.gamespec.mechanics import ChoiceKind

    B, P = state.present.shape
    A = action_space(lowered)
    kind = jnp.take(jnp.asarray(lowered.choice_kind), state.phase)[:, None, None]  # (B,1,1)
    kmax = jnp.take(jnp.asarray(lowered.choice_max), state.phase)[:, None, None]
    n_present = jnp.sum(state.present, axis=1, dtype=jnp.int32)[:, None, None]
    cidx = jnp.arange(1, A + 1, dtype=jnp.int32)[None, None, :]

    alive = _alive(lowered, state)
    alive_pad = jnp.pad(alive, ((0, 0), (0, max(0, A - P))))[:, None, :]  # (B,1,A)
    target_ok = (cidx <= P) & alive_pad
    hi = jnp.where(kmax > 0, kmax, n_present)
    option_ok = cidx <= hi
    submit_ok = cidx == 1
    mask = jnp.where(
        kind == ChoiceKind.TARGET.value,
        target_ok,
        jnp.where(kind == ChoiceKind.OPTION.value, option_ok, submit_ok),
    )
    return jnp.broadcast_to(mask, (B, P, A))


def sample_actions(lowered: Lowered, params, state: GameState, key, cfg: NetConfig):
    """Sample per-player choices; returns (actions (B,P), logp, value, logits)."""
    obs = observe(lowered, state)
    logits, value = apply_net(params, obs, cfg)
    mask = legal_action_mask(lowered, state)
    neg = jnp.float32(-1e9)
    logits = jnp.where(mask, logits, neg)
    a = jax.random.categorical(key, logits, axis=-1)  # (B, P) in [0, A)
    logp = jnp.take_along_axis(jax.nn.log_softmax(logits, axis=-1), a[..., None], axis=-1)[..., 0]
    return (a + 1).astype(jnp.int32), logp, value, mask
