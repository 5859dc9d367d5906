"""Degenerate-lake contract guard (VERDICT r10 #3).

tools/degenerate_sweep.py runs EVERY registered query against five
pathological lakes (empty / single-row / null-striped / one-language /
one-key-total-skew) on BOTH engines and demands they AGREE — both succeed with canonically equal
rows, or both reject. The committed DEGENERATE.json is that run's
artifact; these tests pin that

  * the artifact covers every fixture and every registered query (so a
    newly registered query FAILS here until the sweep is re-run — the
    staleness tripwire), and
  * every cell agrees (``match`` or ``both_reject``) — a disagreement can
    never be committed silently.

The sweep itself is a crash-isolated out-of-process runner (a degenerate
input that hard-crashes one query must not take down the gate); re-run
with:  python tools/degenerate_sweep.py
"""

from __future__ import annotations

import json
from pathlib import Path

from py_datalake_move_files_spark.queries import QUERIES

ROOT = Path(__file__).resolve().parent.parent
ARTIFACT = ROOT / "DEGENERATE.json"
FIXTURES = ("empty", "single", "nullopt", "onelang", "onekey")
AGREE = ("match", "both_reject")


def _load() -> dict:
    assert ARTIFACT.exists(), (
        "DEGENERATE.json missing — run: python tools/degenerate_sweep.py"
    )
    return json.loads(ARTIFACT.read_text())


def test_every_fixture_covers_the_registry():
    data = _load()
    assert set(data) == set(FIXTURES), sorted(set(FIXTURES) ^ set(data))
    for fixture in FIXTURES:
        missing = set(QUERIES) - set(data[fixture])
        assert not missing, (
            f"{fixture}: queries registered after the last sweep "
            f"(re-run tools/degenerate_sweep.py): {sorted(missing)[:10]}"
        )


def test_every_cell_agrees():
    data = _load()
    bad = [
        (fixture, name, cell["status"])
        for fixture, cells in data.items()
        for name, cell in cells.items()
        if cell["status"] not in AGREE
    ]
    assert not bad, f"engine disagreements on degenerate lakes: {bad[:10]}"
