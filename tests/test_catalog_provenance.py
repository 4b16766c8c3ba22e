"""Catalog hygiene guards (VERDICT r4 items 1 & 9).

games/ is the LIVE catalog: everything in it is served by /api/games and
pinned by the golden fixture.  Two failure modes have actually happened:

1. A verify-drive's generated artifacts were committed into games/ and
   broke the golden-coverage and byte-pin guards at HEAD (round 4).
2. Catalog entries landed without a provenance row in games/README.md,
   the declared provenance record for a directory that includes two
   byte-copied reference files.

These guards make both loud at test time, before any snapshot commit.
"""

import os
import re

from game_engine_tpu.gamespec.parser import games_dir


def _game_files():
    return sorted(fn for fn in os.listdir(games_dir())
                  if fn.endswith((".yaml", ".yml")))


def test_every_served_game_has_a_readme_provenance_row():
    """Every file the catalog endpoint serves must be named in
    games/README.md.  (The two reference-verbatim games are covered by
    the README's opening paragraph, which names them explicitly.)"""
    readme = open(os.path.join(games_dir(), "README.md")).read()
    missing = [fn for fn in _game_files() if f"`{fn}`" not in readme
               and fn not in readme]
    assert not missing, (
        f"games/README.md has no provenance row for: {missing} — add one "
        "(what generated it / why it ships) or move the file out of games/.")


def test_no_scratch_artifacts_in_catalog():
    """Scratch/verify-drive artifacts must not land in the served catalog.
    Generated verification games belong under tests/fixtures/ (or a temp
    dir) where games_dir() globs never see them."""
    pat = re.compile(r"(verify|scratch|debug|tmp|temp|wip)\d*\.(ya?ml)$",
                     re.IGNORECASE)
    bad = [fn for fn in _game_files() if pat.search(fn)]
    assert not bad, (
        f"scratch artifacts committed into games/: {bad} — delete them or "
        "move them under tests/fixtures/ (round-4 regression guard).")
