"""Compile-explain surface (dslgen/explain.py + /api/games/<name>/explain):
the analyzer's interpretation of a game, rendered for authors. Contrast:
the reference re-reads prose via its referee LLM every turn
(agent/prompt/referee_system_prompt_1.txt); a deterministic analyzer needs
an explain tool for authors to trust the compilation.
"""

import json
import os

from game_engine_tpu.dslgen.explain import explain_game, explain_spec
from game_engine_tpu.gamespec.parser import games_dir, load_builtin


def test_werewolf_explains_its_mechanics():
    d = explain_game("werewolf")
    assert d["n_phases"] == 18 and d["start_phase"] == 0
    by_name = {p["name"]: p for p in d["phases"]}
    role = by_name["Role Assignment"]
    assert any("role_assignment (P10)" in m for m in role["mechanics"])
    night = next(p for p in d["phases"]
                 if any("night_resolution" in m for m in p["mechanics"]))
    assert "kill choices from phases" in night["mechanics"][0] or any(
        "kill choices" in m for m in night["mechanics"])
    assert any(
        any("vote_elimination (P6)" in m for m in p["mechanics"])
        for p in d["phases"])
    # a night target phase records a TARGET choice
    ww = by_name["First Night — Werewolves Choose Target"]
    assert ww["record"]["choice"].startswith("target")
    # hidden role is not public
    fields = {f["name"]: f["visibility"] for f in d["fields"]}
    assert fields["role"] != "public"
    # branch conditions ride with recognition status
    checks = [p for p in d["phases"] if isinstance(p["next"], list)]
    assert checks and all("condition" in b and "to" in b
                          for p in checks for b in p["next"])


def test_effects_program_summary():
    d = explain_game("storm-forge")
    progs = [m for p in d["phases"] for m in p["mechanics"]
             if m.startswith("effects program")]
    assert progs and "block(s)" in progs[0] and "writes" in progs[0]
    term = [m for p in d["phases"] for m in p["mechanics"]
            if m.startswith("terminal")]
    assert term  # declared terminal surfaced


def test_every_catalog_game_explains_and_is_json():
    for fn in sorted(os.listdir(games_dir())):
        if not fn.endswith((".yaml", ".yml")):
            continue
        d = explain_spec(load_builtin(os.path.splitext(fn)[0]))
        json.dumps(d)  # serializable end to end
        assert d["n_phases"] >= 2 and d["phases"] and d["fields"], fn
        # every non-terminal phase names a next hop
        for p in d["phases"]:
            assert p["terminal"] or p["next"] is not None, (fn, p["id"])


def test_http_route():
    import threading

    from game_engine_tpu.server.api import make_server
    from tests.test_server import req

    srv = make_server(port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        st, d = req(srv, "GET", "/api/games/werewolf/explain")
        assert st == 200 and d["n_phases"] == 18
        assert any("role_assignment" in m
                   for p in d["phases"] for m in p["mechanics"])
        st2, _ = req(srv, "GET", "/api/games/no-such-game-xyz/explain")
        assert st2 == 404
    finally:
        srv.shutdown()


def test_post_explain_unsaved_yaml():
    """POST /api/explain: the author loop — validate + explain a draft
    without saving it to games/."""
    import threading

    from game_engine_tpu.server.api import make_server
    from tests.test_server import req

    srv = make_server(port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        good = open(os.path.join(games_dir(), "gift-circle.yaml")).read()
        st, d = req(srv, "POST", "/api/explain", {"yaml": good})
        assert st == 200 and not d["errors"] and d["explain"]["n_phases"] >= 2
        st2, d2 = req(srv, "POST", "/api/explain", {"yaml": "just: a scalar"})
        assert st2 == 422 and d2["errors"]
        st3, d3 = req(srv, "POST", "/api/explain", {"yaml": ":\n  - ["})
        assert st3 == 422 and "invalid YAML" in d3["error"]
    finally:
        srv.shutdown()


def test_library_ui_wires_the_explain_endpoint():
    """The library page's Rules toggle must call the explain route and
    render the fields the endpoint actually serves."""
    src = open(os.path.join(os.path.dirname(__file__), "..",
                            "game_engine_tpu", "server", "web",
                            "lobby.js")).read()
    assert "/explain" in src and "showExplain" in src
    for field in ("roles", "phases", "mechanics", "terminal"):
        assert field in src, field
