"""GameState: struct-of-arrays room state, batched over a leading rooms axis.

The reference keeps one free-form dict per room thread (reference:
agent/game_agent_v2.py:97-117 AgentState); here every declared player field
lives in a fixed-shape typed bank so thousands of rooms step in one fused
XLA program. Engine-internal registers (phase, acted, choice, ...) replace
the reference's playerActions / phase_history bookkeeping
(reference: agent/tools/backend_tools.py:285-344, game_agent_v2.py:1206-1215).
"""

from __future__ import annotations

from typing import NamedTuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from game_engine_tpu.gamespec.tables import Lowered


class GameState(NamedTuple):
    """All arrays carry a leading batch (rooms) axis B."""

    bools: jax.Array  # (B, P, NB) bool — boolean player fields
    nums: jax.Array  # (B, P, NN) int32 — numeric player fields
    strs: jax.Array  # (B, P, NS) int8 — categorical (string) player fields
    pdict: jax.Array  # (B, P, NPD, P) int8 — player-keyed dict fields
    odict: jax.Array  # (B, P, NOD) int8 — opaque dict mark slots
    present: jax.Array  # (B, P) bool — player exists in room
    phase: jax.Array  # (B,) int32 — dense phase index
    prev_phase: jax.Array  # (B,) int32 — previous distinct phase (-1 at start)
    acted: jax.Array  # (B, P) bool — acted in current phase
    choice: jax.Array  # (B, P) int32 — last accepted choice
    choice_phase: jax.Array  # (B, P) int32 — phase of last accepted choice (-1)
    done: jax.Array  # (B,) bool
    winner: jax.Array  # (B,) int32 — 0 none; team index+1 or player id
    t: jax.Array  # (B,) int32 — step counter
    seed: jax.Array  # (B,) uint32 — room seed (role perms, policies)

    @property
    def batch(self) -> int:
        return self.present.shape[0]


def init_state(
    lowered: Lowered,
    batch: int,
    n_players: Union[int, np.ndarray, jax.Array],
    seeds: Union[int, np.ndarray, jax.Array],
) -> GameState:
    """Fresh rooms at the start phase with template-default fields.

    Mirrors the reference's player_states initialization from
    player_states_template (reference: agent/tools/utils.py:584-653,
    src/app/api/games/initialize-players/route.ts:83-166).
    """
    P = lowered.P
    n = jnp.broadcast_to(jnp.asarray(n_players, jnp.int32), (batch,))
    seed = jnp.broadcast_to(jnp.asarray(seeds, jnp.uint32), (batch,))
    present = jnp.arange(P, dtype=jnp.int32)[None, :] < n[:, None]

    state = GameState(
        bools=jnp.broadcast_to(
            jnp.asarray(lowered.bool_defaults), (batch, P, lowered.bool_defaults.shape[0])
        ),
        nums=jnp.broadcast_to(
            jnp.asarray(lowered.num_defaults), (batch, P, lowered.num_defaults.shape[0])
        ),
        # categorical banks are int8: vocab codes are tiny (< 128, asserted
        # at lowering) and these banks dominate per-step HBM traffic at
        # large batch (the pdict bank alone is (B, P, NPD, P))
        strs=jnp.broadcast_to(
            jnp.asarray(lowered.str_defaults, jnp.int8),
            (batch, P, lowered.str_defaults.shape[0]),
        ),
        pdict=jnp.zeros((batch, P, max(1, lowered.game.layout.n_pdict), P), jnp.int8),
        odict=jnp.zeros((batch, P, max(1, lowered.game.layout.n_odict)), jnp.int8),
        present=present,
        phase=jnp.full((batch,), lowered.game.start_index, jnp.int32),
        prev_phase=jnp.full((batch,), -1, jnp.int32),
        acted=jnp.zeros((batch, P), bool),
        choice=jnp.zeros((batch, P), jnp.int32),
        choice_phase=jnp.full((batch, P), -1, jnp.int32),
        done=jnp.zeros((batch,), bool),
        winner=jnp.zeros((batch,), jnp.int32),
        t=jnp.zeros((batch,), jnp.int32),
        seed=seed,
    )
    # on-enter mechanics of the start phase (none in the shipped games, but
    # generated DSLs may open with e.g. a role-assignment phase)
    from game_engine_tpu.core.step import apply_on_enter

    entered = jnp.ones((batch,), bool)
    return apply_on_enter(lowered, state, entered, state.phase)
