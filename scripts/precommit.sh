#!/bin/sh
# Fast pre-commit guard (seconds, not minutes): the artifact classes a
# verify-drive or generator session produces are exactly what these cover —
# catalog hygiene, golden-fixture coverage, and the generator byte-pins.
# Round 4 shipped a red HEAD because the snapshot commit was the first time
# the suite saw the tree; running this before EVERY commit makes that
# unrepeatable.  Install:  ln -sf ../../scripts/precommit.sh .git/hooks/pre-commit
set -e
cd "$(git rev-parse --show-toplevel)"
exec python -m pytest -q -x \
    tests/test_catalog_provenance.py \
    tests/test_golden.py::test_fixture_covers_every_game \
    tests/test_dslgen_rules.py
