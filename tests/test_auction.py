"""P19 sealed-bid auctions: analyzer attachment, the auction archetype,
and four-way executor parity (oracle ⇔ XLA ⇔ C++ ⇔ Pallas).

The reference executes arbitrary auction-like games through its LLM
referee (reference: agent/prompt/referee_system_prompt_1.txt); here the
family is a pinned deterministic kernel (SEMANTICS.md P19)."""

import collections

import numpy as np
import pytest

from game_engine_tpu.core.engine import BatchedEngine, compiled_rollout, scripted_actions
from game_engine_tpu.core.state import init_state
from game_engine_tpu.dslgen.generate import generate_from_description
from game_engine_tpu.dslgen.validate import errors, validate_doc
from game_engine_tpu.gamespec import mechanics as M
from game_engine_tpu.gamespec.compile import compile_game
from game_engine_tpu.gamespec.tables import lower
from game_engine_tpu.oracle.interp import OracleRoom
from game_engine_tpu.policies.scripted import oracle_policy
from tests.test_parity import assert_state_matches

AUCTION_DESC = (
    "players collect coins and take part in a sealed-bid auction for rare "
    "lots; highest bidder wins"
)


@pytest.fixture(scope="module")
def auction():
    doc = generate_from_description("auction-house", AUCTION_DESC)
    issues, spec = validate_doc(doc, name="auction-house")
    assert not issues, [str(i) for i in issues]
    return lower(compile_game(spec))


def test_description_mines_auction_archetype():
    doc = generate_from_description("a", "a bidding war for ancient relics")
    names = [p["name"] for p in doc["phases"].values()]
    assert "Auction Resolution" in names
    # bare economy words without auction vocabulary stay market
    doc2 = generate_from_description("b", "collect coins and raid purses")
    assert "Auction Resolution" not in [p["name"] for p in doc2["phases"].values()]


def test_analyzer_attaches_auction(auction):
    mechs = [m for cp in auction.game.phases for m in cp.program.on_enter]
    au = [m for m in mechs if isinstance(m, M.AuctionScore)]
    assert len(au) == 1
    assert au[0].res_field == "coins" and au[0].prize_field == "points"
    assert au[0].bid_field == "bid_choice"


def test_auction_semantics_pinned():
    """Hand-check P19 on a tiny constructed round: highest effective bid
    wins with ties to lowest id, purse-capped, winner pays, bids reset."""
    doc = generate_from_description("auction-house", AUCTION_DESC)
    _, spec = validate_doc(doc, name="auction-house")
    game = compile_game(spec)
    au = next(m for cp in game.phases for m in cp.program.on_enter
              if isinstance(m, M.AuctionScore))
    room = OracleRoom(game, n_players=3, seed=0)
    # craft a state: p1 bids 4 but holds 2 (capped to 2); p2 bids 3 holds 9;
    # p3 bids 3 holds 9 -> p2 and p3 tie at 3, p2 wins (lowest id), pays 3
    for p, (coins, bid) in {1: (2, 4), 2: (9, 3), 3: (9, 3)}.items():
        room.players[p][au.res_field] = coins
        room.players[p][au.bid_field] = bid
    room.apply_mechanic(au)
    assert room.players[2][au.prize_field] == 1
    assert room.players[2][au.res_field] == 6
    assert room.players[1][au.prize_field] == 0
    assert room.players[1][au.res_field] == 2
    assert all(room.players[p][au.bid_field] == 0 for p in (1, 2, 3))


def test_auction_no_competing_bid_is_noop():
    doc = generate_from_description("auction-house", AUCTION_DESC)
    _, spec = validate_doc(doc, name="auction-house")
    game = compile_game(spec)
    au = next(m for cp in game.phases for m in cp.program.on_enter
              if isinstance(m, M.AuctionScore))
    room = OracleRoom(game, n_players=3, seed=0)
    for p in (1, 2, 3):  # broke players: bids are purse-capped to 0
        room.players[p][au.res_field] = 0
        room.players[p][au.bid_field] = 5
    room.apply_mechanic(au)
    assert all(room.players[p][au.prize_field] == 0 for p in (1, 2, 3))
    assert all(room.players[p][au.bid_field] == 0 for p in (1, 2, 3))


@pytest.mark.parametrize("seed", range(4))
def test_auction_oracle_engine_parity(auction, seed):
    n = min(4 + seed, auction.P)
    room = OracleRoom(auction.game, n_players=n, seed=seed)
    eng = BatchedEngine(auction)
    state = init_state(auction, 1, n, np.uint32(seed))
    for t in range(600):
        room.step(oracle_policy(room, t, seed))
        state = eng.step(state, scripted_actions(auction, state))
        assert_state_matches(auction, room, state, 0, t)
        if room.done:
            break
    assert room.done and room.winner >= 1


def test_auction_terminates_with_varied_winners(auction):
    wins = collections.Counter()
    for seed in range(12):
        room = OracleRoom(auction.game, n_players=5, seed=seed)
        for t in range(600):
            room.step(oracle_policy(room, t, seed))
            if room.done:
                break
        assert room.done
        wins[room.winner] += 1
    assert len(wins) >= 2  # not always the tie-break favourite


def test_auction_cpp_parity(auction):
    from game_engine_tpu.native import available

    if not available():
        pytest.skip("native backend unavailable")
    from tests.test_native import run_differential

    for seed in (0, 1, 3):
        run_differential(auction, n_players=5, seed=seed, max_steps=600)


def test_auction_pallas_parity(auction):
    from game_engine_tpu.core.pallas_rollout import make_pallas_rollout
    from tests.test_pallas import _states_equal

    B, steps = 8, 48
    state = init_state(auction, B, 5, np.arange(B, dtype=np.uint32))
    ref_state, ref_eps = compiled_rollout(auction, steps)(state)
    pal = make_pallas_rollout(auction, steps, block_rooms=8, interpret=True)
    state2 = init_state(auction, B, 5, np.arange(B, dtype=np.uint32))
    pal_state, pal_eps = pal(state2)
    _states_equal(ref_state, pal_state)
    assert int(ref_eps) == int(pal_eps) and int(ref_eps) > 0


def test_catalog_auction_house_matches_generator():
    """games/auction-house.yaml is the generator's output for its
    description — the catalog copy can't drift from the blueprint."""
    import os

    import yaml

    from game_engine_tpu.gamespec.parser import games_dir

    path = os.path.join(games_dir(), "auction-house.yaml")
    on_disk = yaml.safe_load(open(path))
    assert on_disk == generate_from_description("auction-house", AUCTION_DESC)


def test_auction_hint_forces_attachment():
    """P18 x P19: an out-of-vocabulary resolution phase ('the gavel falls')
    drops AuctionScore silently — statically undetectable here because
    every declared field is still touched by income/branches — and the
    game then never terminates (the dynamic loud path: the alien-fuzz
    run-contract catches it). The `mechanics: [auction]` hint pins it."""
    doc = generate_from_description("auction-house", AUCTION_DESC)
    res = doc["phases"][3]
    res["name"] = "The Gavel Falls"
    res["description"] = "The gavel falls and the lot changes hands."
    res.pop("mechanics", None)  # generate() self-annotates; simulate unhinted
    issues, spec = validate_doc(doc, name="gavel-unhinted")
    assert not errors(issues)
    game = compile_game(spec)
    cp = next(c for c in game.phases if c.dsl_id == 3)
    assert not any(isinstance(m, M.AuctionScore) for m in cp.program.on_enter)
    room = OracleRoom(game, n_players=4, seed=0)
    for t in range(300):
        room.step(oracle_policy(room, t, 0))
    assert not room.done  # nobody can ever win a lot

    res["mechanics"] = ["auction"]
    issues, spec = validate_doc(doc, name="gavel-hinted")
    assert not issues, [str(i) for i in issues]
    game = compile_game(spec)
    cp = next(c for c in game.phases if c.dsl_id == 3)
    assert any(isinstance(m, M.AuctionScore) for m in cp.program.on_enter)
    room = OracleRoom(game, n_players=4, seed=0)
    for t in range(600):
        room.step(oracle_policy(room, t, 0))
        if room.done:
            break
    assert room.done
