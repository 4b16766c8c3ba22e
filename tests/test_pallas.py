"""Pallas fused rollout vs the XLA scan rollout — bit-identical (interpret
mode on CPU; the TPU path is exercised by bench runs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from game_engine_tpu.core.engine import make_rollout
from game_engine_tpu.core.pallas_rollout import make_pallas_rollout
from game_engine_tpu.core.state import init_state
from game_engine_tpu.gamespec.compile import compile_game
from game_engine_tpu.gamespec.parser import load_builtin
from game_engine_tpu.gamespec.tables import lower


@pytest.fixture(scope="module")
def ww():
    return lower(compile_game(load_builtin("werewolf")))


def _states_equal(a, b, skip_seed=False):
    for name, fa, fb in zip(a._fields, a, b):
        if skip_seed and name == "seed":
            continue
        np.testing.assert_array_equal(
            np.asarray(fa), np.asarray(fb), err_msg=f"field {name}"
        )


@pytest.mark.parametrize("steps", [40, 130])
def test_pallas_matches_engine_rollout(ww, steps):
    B = 8
    # block_rooms == B so one kernel instance covers the batch (interpret)
    pall = make_pallas_rollout(ww, steps, block_rooms=B, interpret=True)
    ref = jax.jit(make_rollout(ww, steps, auto_reset=True))
    s0 = init_state(ww, B, 6, np.arange(B, dtype=np.uint32))
    s1 = init_state(ww, B, 6, np.arange(B, dtype=np.uint32))
    out_p, eps_p = pall(s0)
    out_r, eps_r = ref(s1)
    assert int(eps_p) == int(eps_r), f"episodes {int(eps_p)} != {int(eps_r)}"
    _states_equal(out_p, out_r)


def test_pallas_twotruths_parity():
    """Rotation/scoring mechanics through the kernel (two-truths)."""
    from game_engine_tpu.gamespec.compile import GameConfig

    lw = lower(compile_game(load_builtin("two-truths-and-a-lie"), GameConfig()))
    steps = 90
    pall = make_pallas_rollout(lw, steps, block_rooms=8, interpret=True)
    ref = jax.jit(make_rollout(lw, steps, auto_reset=True))
    out_p, eps_p = pall(init_state(lw, 8, 4, np.arange(8, dtype=np.uint32)))
    out_r, eps_r = ref(init_state(lw, 8, 4, np.arange(8, dtype=np.uint32)))
    assert int(eps_p) == int(eps_r) and int(eps_p) > 0
    _states_equal(out_p, out_r)


def test_pallas_generated_game_parity():
    """A generated DSL (different phase graph) through the kernel."""
    from game_engine_tpu.dslgen.generate import generate_from_description
    from game_engine_tpu.gamespec.parser import parse_game_spec

    doc = generate_from_description("assassins", "hidden-role night elimination game")
    lw = lower(compile_game(parse_game_spec(doc, name="assassins")))
    steps = 80
    pall = make_pallas_rollout(lw, steps, block_rooms=8, interpret=True)
    ref = jax.jit(make_rollout(lw, steps, auto_reset=True))
    out_p, eps_p = pall(init_state(lw, 8, 5, np.arange(8, dtype=np.uint32)))
    out_r, eps_r = ref(init_state(lw, 8, 5, np.arange(8, dtype=np.uint32)))
    assert int(eps_p) == int(eps_r)
    _states_equal(out_p, out_r)


def test_pallas_blocks_are_independent(ww):
    """Two blocks of rooms must equal one bigger block reshaped."""
    steps = 60
    s0 = init_state(ww, 8, 5, np.arange(8, dtype=np.uint32))
    one = make_pallas_rollout(ww, steps, block_rooms=8, interpret=True)
    two = make_pallas_rollout(ww, steps, block_rooms=4, interpret=True)
    o1, e1 = one(init_state(ww, 8, 5, np.arange(8, dtype=np.uint32)))
    o2, e2 = two(init_state(ww, 8, 5, np.arange(8, dtype=np.uint32)))
    assert int(e1) == int(e2)
    _states_equal(o1, o2)
