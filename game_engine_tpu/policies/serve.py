"""Serve trained policies as in-room bots (--bot-ckpt).

The reference's interactive bots decide contextually via LLM (reference:
agent/game_agent_v2.py:468-617 BotBehaviorNode); rounds 1-2 served only the
uniform-random scripted policy while trained checkpoints sat unused in
docs/checkpoints/. This module loads a policies/net.py checkpoint and
exposes GREEDY (argmax) action selection — deterministic given the room
state, so journal replay reproduces policy-bot rooms bit-identically.

Works on both serving backends:
  * jax backend: one jitted forward over the whole slot batch per step;
  * native backend: the C++ room state converts to a one-room GameState and
    runs the same jitted forward — logits, and therefore actions, are
    identical to the jax backend for identical states.

The net config (arch / hidden / heads) is INFERRED from the checkpoint's
parameter shapes, so a bare `--bot-ckpt werewolf=path.npz` needs no extra
flags.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from game_engine_tpu.core.state import GameState
from game_engine_tpu.gamespec.tables import Lowered
from game_engine_tpu.policies import net as N


def infer_net_config(params: dict[str, Any]) -> N.NetConfig:
    """Reconstruct the NetConfig from parameter shapes: attn carries w_qkv,
    deepsets carries w_phi0 without it, the flat MLP neither. Hidden width
    comes from the first trunk layer's output dim."""
    if "w_qkv" in params:
        arch = "attn"
    elif "w_phi0" in params:
        arch = "deepsets"
    else:
        arch = "mlp"
    hidden = int(np.asarray(params["w0"]).shape[1])
    layers = 0
    while f"w{layers}" in params:
        layers += 1
    # attn head count does NOT affect parameter shapes (w_qkv is
    # (hp, 3*hp) for any nh) so it cannot be inferred — it rides in the
    # .tree.json sidecar meta; absent meta defaults to 1 (every shipped
    # checkpoint), and load_policy overrides from meta when present
    return N.NetConfig(hidden=hidden, layers=layers, arch=arch,
                       attn_heads=1)


def load_policy(path: str) -> tuple[dict[str, Any], N.NetConfig]:
    """Load a save_tree checkpoint (npz + .tree.json) without needing a
    params template: leaves come back keyed by flattened order."""
    import json

    stem = path[:-4] if path.endswith(".npz") else path
    with open(stem + ".tree.json", encoding="utf-8") as f:
        meta = json.load(f)
    npz = np.load(stem + ".npz")
    leaves = [npz[k] for k in
              sorted(npz.files, key=lambda s: int(s.rsplit("_", 1)[1]))]
    # treedef was serialized as its repr; the policy params are a flat dict,
    # so the sorted key order in the repr IS the leaf order
    import re

    keys = re.findall(r"'([^']+)': \*", meta["treedef"])
    if len(keys) != len(leaves):
        raise ValueError(
            f"checkpoint {path}: {len(leaves)} leaves vs {len(keys)} keys")
    params = {k: jnp.asarray(v) for k, v in zip(keys, leaves)}
    cfg = infer_net_config(params)
    heads = int((meta.get("meta") or {}).get("attn_heads", 0))
    if heads:
        cfg = dataclasses.replace(cfg, attn_heads=heads)
    return params, cfg


class PolicyBots:
    """Greedy policy actor bound to one compiled game."""

    def __init__(self, lowered: Lowered, params: dict[str, Any],
                 cfg: N.NetConfig, ckpt_path: str = ""):
        self.lowered = lowered
        self.params = params
        self.cfg = cfg
        self.ckpt_path = ckpt_path
        self._greedy = jax.jit(self._greedy_fn)

    def _greedy_fn(self, state: GameState) -> jax.Array:
        """(B, P) int32 greedy choices: argmax over legal-masked logits.

        Deterministic — ties resolve to the lowest action index (argmax
        picks the first maximum), so replay is exact."""
        lw = self.lowered
        obs = N.observe(lw, state)
        logits, _ = N.apply_net(self.params, obs, self.cfg, lw)
        mask = N.legal_action_mask(lw, state)
        logits = jnp.where(mask, logits, jnp.float32(-1e9))
        a = jnp.argmax(logits, axis=-1).astype(jnp.int32) + 1
        # emit 0 (no action) when the phase offers no legal choice at all
        any_legal = jnp.any(mask, axis=-1)
        return jnp.where(any_legal & state.present, a, 0)

    def actions(self, state: GameState) -> np.ndarray:
        """(B, P) int32 numpy actions for a batched GameState."""
        return np.asarray(self._greedy(state))

    # -- native backend bridge ------------------------------------------------

    def state_from_native(self, read: dict[str, Any], n_players: int,
                          seed: int = 0) -> GameState:
        """One-room GameState from CppRoom.read() output — the same arrays
        the jax engine would hold, so the forward pass is identical."""
        lw = self.lowered
        P = lw.P
        present = np.arange(P) < n_players
        return GameState(
            bools=jnp.asarray(read["bools"][None].astype(bool)),
            nums=jnp.asarray(read["nums"][None].astype(np.int32)),
            strs=jnp.asarray(read["strs"][None].astype(np.int8)),
            pdict=jnp.asarray(read["pdict"][None].astype(np.int8)),
            odict=jnp.asarray(read["odict"][None].astype(np.int8)),
            present=jnp.asarray(present[None]),
            phase=jnp.asarray([read["phase_index"]], jnp.int32),
            prev_phase=jnp.asarray([read["prev_index"]], jnp.int32),
            acted=jnp.asarray(read["acted"][None].astype(bool)),
            choice=jnp.asarray(read["choice"][None].astype(np.int32)),
            choice_phase=jnp.asarray(read["choice_phase"][None].astype(np.int32)),
            done=jnp.asarray([read["done"]], bool),
            winner=jnp.asarray([read["winner"]], jnp.int32),
            t=jnp.asarray([read["t"]], jnp.int32),
            seed=jnp.asarray([seed], jnp.uint32),
        )

    def native_actions(self, read: dict[str, Any], n_players: int,
                       seed: int = 0) -> dict[int, int]:
        """{pid: choice} for one native room (0-emissions dropped). The
        seed rides into GameState for interface parity with SearchBots —
        the greedy forward itself never reads it."""
        acts = self.actions(self.state_from_native(read, n_players, seed))[0]
        return {p + 1: int(acts[p]) for p in range(len(acts)) if acts[p] != 0}


def load_bot_policies(specs: list[str]) -> dict[str, tuple[dict, N.NetConfig, str]]:
    """Parse repeated --bot-ckpt 'game=path' (or bare 'path', matching every
    game) into {game_fragment: (params, cfg, path)}."""
    out: dict[str, tuple[dict, N.NetConfig, str]] = {}
    for spec in specs or []:
        if "=" in spec:
            game, path = spec.split("=", 1)
        else:
            game, path = "", spec
        params, cfg = load_policy(path)
        out[game.strip().lower()] = (params, cfg, path)
    return out
