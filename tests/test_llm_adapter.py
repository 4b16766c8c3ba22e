"""The dslgen llm_hook adapter (dslgen/llm_adapter.py): prompt contract,
completion parsing, validate-retry-with-feedback, and keep-original-on-
failure fallback — the documented integration point for arbitrary
described games (reference: agent/dsl_agent.py:157-371's gpt-5 pipeline,
exercised here with stub completion functions; zero egress)."""

import yaml

from game_engine_tpu.dslgen.generate import generate_from_description
from game_engine_tpu.dslgen.llm_adapter import (build_prompt, make_llm_hook,
                                                parse_completion)
from game_engine_tpu.dslgen.validate import errors, validate_doc
from tests.test_fuzz_alien import _council_doc, _run_contract


def _council_yaml(**kw) -> str:
    return yaml.safe_dump(_council_doc(**kw), sort_keys=False)


def test_prompt_carries_contract_and_feedback():
    p = build_prompt("g", "a mystery game")
    assert "mechanics:" in p and "vote_elimination" in p
    assert "clearCanvas" in p and "first-match-wins" in p
    p2 = build_prompt("g", "a mystery game", feedback=["phases.3: bad branch"])
    assert "failed validation" in p2 and "phases.3: bad branch" in p2


def test_parse_strips_fences_and_prose():
    text = ("Here is your game:\n```yaml\n" + _council_yaml() + "```\n")
    doc = parse_completion(text)
    assert "declaration" in doc and "phases" in doc


def test_good_completion_is_validated_and_annotated():
    hook = make_llm_hook(lambda prompt: _council_yaml())
    doc = hook("council", "a council votes members out")
    issues, spec = validate_doc(doc, name="council")
    assert not errors(issues) and spec is not None
    # the adapter self-annotates P18 hints like the deterministic path
    assert any(p.get("mechanics") for p in doc["phases"].values())
    outcome, _ = _run_contract(doc, "council-llm")
    assert outcome == "ran"


def test_retry_feeds_validator_errors_back():
    calls = []

    def complete(prompt):
        calls.append(prompt)
        if len(calls) == 1:
            # invalid: unknown mechanic hint -> hard validator error
            doc = _council_doc()
            doc["phases"][3]["mechanics"] = ["telepathy"]
            return yaml.safe_dump(doc, sort_keys=False)
        assert "unknown mechanic 'telepathy'" in prompt  # feedback loop
        return _council_yaml()

    hook = make_llm_hook(complete)
    doc = hook("council", "a council votes members out")
    assert len(calls) == 2
    assert not errors(validate_doc(doc, name="c")[0])


def test_garbage_falls_back_to_deterministic_path():
    hook = make_llm_hook(lambda prompt: "not yaml: [unclosed", max_retries=1)
    desc = "hidden-role night elimination game"
    doc = hook("assassins", desc)
    assert doc == generate_from_description("assassins", desc)


def test_hook_plugs_into_generate_from_description():
    hook = make_llm_hook(lambda prompt: _council_yaml())
    doc = generate_from_description("council", "whatever", llm_hook=hook)
    assert not errors(validate_doc(doc, name="c")[0])


def test_string_phase_keys_still_get_annotated():
    """LLM completions commonly quote phase ids ('0':, '1': ...); the
    adapter must still write P18 hints into them (annotate_mechanics is
    key-type tolerant)."""
    doc = _council_doc()
    doc["phases"] = {str(k): v for k, v in doc["phases"].items()}
    hook = make_llm_hook(lambda prompt: yaml.safe_dump(doc, sort_keys=False))
    out = hook("council", "a council votes members out")
    assert any(p.get("mechanics") for p in out["phases"].values()), \
        "string-keyed phases lost their P18 annotations"
    assert not errors(validate_doc(out, name="c")[0])
