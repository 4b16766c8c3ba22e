"""Multi-device correctness: sharding must not change semantics.

The actual multi-chip claim is that the ROLLOUT is bit-identical across
shardings — same seeds, 1 device vs an 8-device ('data',) mesh, identical
final states and episode counts (VERDICT r1 item 7). Integer state makes
this exact: any divergence is a real sharding bug, not float noise."""

import jax
import numpy as np
import pytest

from game_engine_tpu.core.engine import make_rollout
from game_engine_tpu.core.state import init_state
from game_engine_tpu.gamespec.compile import compile_game
from game_engine_tpu.gamespec.parser import load_builtin
from game_engine_tpu.gamespec.tables import lower
from game_engine_tpu.parallel.mesh import make_mesh, state_sharding


@pytest.fixture(scope="module",
                params=["werewolf", "two-truths", "relic-auction"])
def lowered(request):
    return lower(compile_game(load_builtin(request.param)))


def _final_tree(state):
    return {f: np.asarray(getattr(state, f)) for f in state._fields}


@pytest.mark.parametrize("steps", [64])
def test_rollout_bit_identical_1_vs_8_devices(lowered, steps):
    B, n = 32, 6
    rollout = jax.jit(make_rollout(lowered, steps))  # no donation: reuse inputs

    # single device: everything on device 0
    dev0 = jax.devices()[0]
    s1 = jax.device_put(
        init_state(lowered, B, n, np.arange(B, dtype=np.uint32)), dev0
    )
    ref_state, ref_eps = rollout(s1)
    ref = _final_tree(ref_state)

    # 8-device data mesh: rooms sharded on axis 0
    mesh = make_mesh(8, model_parallel=1)
    s8 = state_sharding(
        mesh, init_state(lowered, B, n, np.arange(B, dtype=np.uint32))
    )
    with mesh:
        out_state, out_eps = rollout(s8)
    out = _final_tree(out_state)

    assert int(ref_eps) == int(out_eps)
    assert int(ref_eps) > 0, "no episodes completed in the test window"
    for f in ref:
        np.testing.assert_array_equal(ref[f], out[f], err_msg=f"field {f}")


def test_rollout_bit_identical_4x2_mesh(lowered):
    """A (data=4, model=2) mesh — the dryrun's topology — also leaves the
    integer rollout bit-identical (the 'model' axis is unused by the engine
    but must not perturb placement/semantics)."""
    B, n, steps = 16, 5, 48
    rollout = jax.jit(make_rollout(lowered, steps))
    s1 = jax.device_put(
        init_state(lowered, B, n, np.arange(B, dtype=np.uint32)), jax.devices()[0]
    )
    ref_state, ref_eps = rollout(s1)
    mesh = make_mesh(8, model_parallel=2)
    s8 = state_sharding(mesh, init_state(lowered, B, n, np.arange(B, dtype=np.uint32)))
    with mesh:
        out_state, out_eps = rollout(s8)
    assert int(ref_eps) == int(out_eps)
    for f in ref_state._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(ref_state, f)), np.asarray(getattr(out_state, f)),
            err_msg=f"field {f}",
        )
