"""Learned intent tier for the DSL generator (dslgen/intent.py).

The keyword cascade (generate.keyword_selection) is literal; when no
selection vocabulary fires, the learned hashed-ngram classifier picks the
archetype instead of the blind "rounds" default — the zero-egress stand-in
for the reference's gpt-5 synthesis call (reference:
agent/dsl_agent.py:157-371). These tests pin the integration contract:
(1) the tier serves ONLY regex-blind traffic, (2) its pick is reported as
a NOTE, (3) the shipped checkpoint meets the held-out quality bar, and
(4) disabling the checkpoint cleanly restores the round-1 default.
"""

import json
import os

import pytest

from game_engine_tpu.dslgen import intent as I
from game_engine_tpu.dslgen.generate import (
    generate_from_description,
    keyword_selection,
)
from game_engine_tpu.dslgen.validate import errors, validate_doc

# Regex-blind phrasings (keyword_selection matches NOTHING) whose mechanics
# are obvious to a reader — the exact traffic the learned tier exists for.
BLIND_ELIM = (
    "Every sundown the coven quietly removes a townsfolk. By daylight the "
    "survivors hold a trial and cast one player out of town. Victory goes "
    "to the ordinary folk if they expel every monster in time."
)
BLIND_RACE = (
    "Push your runner down the course; reckless moves can send you "
    "tumbling back. Whoever touches the final marker first is champion."
)


def test_fixtures_are_regex_blind():
    for txt in (BLIND_ELIM, BLIND_RACE):
        sel = keyword_selection(txt)
        assert sel["matched"] is False
        assert sel["archetype"] == "rounds"  # the blind default


def test_classifier_covers_the_blind_spot():
    res = I.classify_default(BLIND_ELIM)
    assert res is not None
    assert res.archetype == "elimination" and res.confident
    res = I.classify_default(BLIND_RACE)
    assert res.archetype == "racing" and res.confident
    # deterministic: same text -> identical result
    again = I.classify_default(BLIND_RACE)
    assert again.probs == res.probs


def test_generate_uses_learned_pick_and_reports_it():
    rep: list[str] = []
    doc = generate_from_description("coven", BLIND_ELIM, report=rep)
    issues, spec = validate_doc(doc, name="coven")
    assert spec is not None and not errors(issues)
    # elimination archetype: hidden roles + night structure
    fields = doc["declaration"]["player_states"]
    assert "role" in fields and "is_alive" in fields
    assert any(r.startswith("NOTE: no selection vocabulary matched") and
               "'elimination'" in r for r in rep)
    # the coverage WARNING still fires — the learned tier widens archetype
    # understanding, not parameter mining
    assert any(r.startswith("WARNING: description coverage") for r in rep)

    rep2: list[str] = []
    doc2 = generate_from_description("derby", BLIND_RACE, report=rep2)
    issues2, spec2 = validate_doc(doc2, name="derby")
    assert spec2 is not None and not errors(issues2)
    assert "position" in doc2["declaration"]["player_states"]
    assert any("'racing'" in r for r in rep2)


def test_keyword_match_bypasses_learned_tier():
    """A description the cascade understands must be untouched by the
    learned tier (every pre-intent generator output stays byte-pinned)."""
    rep: list[str] = []
    txt = "A game where werewolves eliminate villagers at night."
    sel = keyword_selection(txt)
    assert sel["matched"] is True and sel["archetype"] == "elimination"
    generate_from_description("ww", txt, report=rep)
    assert not any("learned intent" in r for r in rep)


def test_missing_checkpoint_restores_round1_default(monkeypatch):
    monkeypatch.setenv("GAME_ENGINE_INTENT_CKPT", "/nonexistent/intent.npz")
    I._default_model.cache_clear()
    try:
        assert I.classify_default(BLIND_RACE) is None
        rep: list[str] = []
        doc = generate_from_description("derby", BLIND_RACE, report=rep)
        # falls back to the round-1 "rounds" default, loudly
        assert "statement" in json.dumps(doc).lower() or \
            "round" in json.dumps(doc).lower()
        assert not any("learned intent" in r for r in rep)
        assert any(r.startswith("WARNING") for r in rep)
    finally:
        I._default_model.cache_clear()


def test_shipped_checkpoint_quality_bar():
    """The checkpoint's metrics sidecar must clear the serving bar: on the
    regex-blind held-out subset, confident picks are >=95% precise (the
    tier only overrides the default when confident) and beat the keyword
    cascade by a wide margin."""
    path = os.path.splitext(I.DEFAULT_CKPT)[0] + ".metrics.json"
    assert os.path.exists(path), "train the checkpoint: python -m " \
        "game_engine_tpu.dslgen.intent train"
    with open(path) as f:
        m = json.load(f)
    assert m["regex_blind_confident_precision"] >= 0.95
    assert m["regex_blind_accuracy"] >= 0.85
    assert m["accuracy"] >= 0.8 > m["keyword_baseline_accuracy"]


def test_metrics_reproduce_from_checkpoint():
    """Re-run the held-out eval (small slice) against the SHIPPED weights:
    guards against a stale sidecar describing a different checkpoint."""
    model = I._default_model()
    assert model is not None
    m = I.evaluate(model, n_per_class=20, seed=0)
    assert m["regex_blind_accuracy"] >= 0.8
    if m["regex_blind_confident_precision"] is not None:
        assert m["regex_blind_confident_precision"] >= 0.9


def test_train_smoke(tmp_path):
    """The trainer runs end to end at toy scale and round-trips a usable
    checkpoint through save/load."""
    model, metrics = I.train(n_per_class=6, epochs=20)
    assert metrics["train_examples"] == 6 * len(model.classes)
    out = str(tmp_path / "intent.npz")
    model.save(out, metrics)
    back = I.IntentModel.load(out)
    r1, r2 = model.classify(BLIND_RACE), back.classify(BLIND_RACE)
    assert r1.archetype == r2.archetype and r1.probs == r2.probs


def test_feature_hashing_is_stable():
    """crc32 feature hashing pins the checkpoint's feature space across
    processes/python versions (unlike builtin hash)."""
    import numpy as np

    v1, v2 = I.features(BLIND_ELIM), I.features(BLIND_ELIM)
    assert np.array_equal(v1, v2)
    assert abs(float(np.linalg.norm(v1)) - 1.0) < 1e-5
