"""The driver hash-checks the first 50 entries of ``queries()`` — pin the
curated window so refactors can't silently push a SURVEY §2 operator or a
flagship LLM op out of it."""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path


def _load_entry():
    path = Path(__file__).resolve().parents[1] / "__spark_entry__.py"
    spec = importlib.util.spec_from_file_location("__spark_entry__", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("__spark_entry__", mod)
    spec.loader.exec_module(mod)
    return mod


def test_curated_window():
    e = _load_entry()
    q, o = e.queries(), e.oracle_sql()
    assert len(e.CURATED_FIRST) == 50
    assert list(q)[:50] == e.CURATED_FIRST
    # same registry, just reordered
    assert set(q) == set(e.QUERIES)
    assert set(o) == set(e.ORACLE)
    # the driver's hash compare needs an oracle for every curated query
    assert [n for n in e.CURATED_FIRST if n not in o] == []


def test_rotation_targets_never_checked_queries():
    """Every window slot is either an anchor (cumulative-green family
    representative, re-verified) or new evidence (a query with no
    driver-green row in the committed ledger) — and ALL never-checked
    queries not explicitly queued must be in the window, so no query's
    first driver check can be deferred by window composition. Anchors/
    rotation are derived from the ledger, not positional counts, so the
    split can change round to round without touching this test. The
    full registry-tiling invariant lives in
    tests/test_rotation_accounting.py."""
    import json

    e = _load_entry()
    root = Path(__file__).resolve().parents[1]
    green = set(json.loads((root / "CORRECTNESS_CUMULATIVE.json").read_text()))
    window = set(e.CURATED_FIRST)
    rotation = window - green  # new-evidence slots
    assert rotation, "window must rotate in at least one unchecked query"
    never = set(e.QUERIES) - green - set(e.QUEUED_FOR_NEXT_WINDOW)
    assert never <= window, sorted(never - window)
