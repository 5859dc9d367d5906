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


def test_round4_rotation_targets_never_checked_queries():
    """The 42 non-anchor slots must all be queries with no driver-side
    CORRECTNESS row from rounds 1-3; the deferred list plus the window
    plus the previously-checked set must cover the whole registry."""
    import json

    e = _load_entry()
    root = Path(__file__).resolve().parents[1]
    checked = set()
    for name in ("CORRECTNESS_r01.json", "CORRECTNESS_r02.json", "CORRECTNESS_r03.json"):
        p = root / name
        if p.exists():
            checked |= set(json.loads(p.read_text()))
    anchors = set(e.CURATED_FIRST[:8])
    rotation = set(e.CURATED_FIRST[8:])
    assert anchors <= checked  # anchors re-verify known-green families
    assert not (rotation & checked)  # every rotated slot is new evidence
    deferred = set(e.NEVER_DRIVER_CHECKED_AFTER_R4)
    assert not (deferred & set(e.CURATED_FIRST))
    assert checked | rotation | deferred == set(e.QUERIES)
