"""Mixed-tier arena (utils/arena.py): table shape, Elo output, determinism."""

import numpy as np
import pytest

from game_engine_tpu.native import available

pytestmark = pytest.mark.skipif(not available(), reason="native lib unavailable")


def test_arena_runs_and_rates_are_sane(monkeypatch):
    from game_engine_tpu.utils import arena

    monkeypatch.setattr(arena, "ROLLOUTS", 4)
    monkeypatch.setattr(arena, "HORIZON", 80)
    out = arena.run_arena("werewolf", 6, ["scripted", "search-det2"])
    assert list(out["table"]) == ["scripted", "search-det2"]
    for r in out["table"].values():
        for v in r.values():
            assert 0.0 <= v <= 1.0
    assert set(out["elo"]["ratings"]) == {"scripted", "search-det2"}
    # deterministic: same seeds, same table
    out2 = arena.run_arena("werewolf", 6, ["scripted", "search-det2"])
    assert out["table"] == out2["table"]
