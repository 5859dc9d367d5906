"""Rotation-accounting guard (VERDICT r4 "Next round" #7).

Round 4's window bookkeeping silently orphaned one query
(multimodal_frame_sample was missing from the hand-kept NEVER list, so its
driver check would have been deferred forever). These tests make that class
of slip impossible: the registry must be EXACTLY tiled by

    (cumulatively driver-green per the committed ledger)
  ∪ (this round's 50-slot window, CURATED_FIRST)
  ∪ (queries registered after the window froze, QUEUED_FOR_NEXT_WINDOW)

with no name unaccounted for and no stale name in any list. The ledger
itself is regenerated from the per-round CORRECTNESS artifacts
(tools/make_cumulative.py), never hand-edited.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import __spark_entry__ as entrymod  # noqa: E402
from py_datalake_move_files_spark.queries import ORACLE, QUERIES  # noqa: E402

sys.path.insert(0, str(ROOT / "tools"))
import make_cumulative  # noqa: E402

LEDGER = json.loads((ROOT / "CORRECTNESS_CUMULATIVE.json").read_text())


def test_ledger_matches_per_round_artifacts():
    """The committed ledger is exactly what the generator produces from the
    CORRECTNESS_r*.json artifacts — it can't drift or be hand-edited.

    Resilient to the in-flight-round artifact race (VERDICT r5 "What's
    wrong" #1): the driver writes CORRECTNESS_r{N}.json AFTER the builder's
    last commit, so the comparison only consumes artifacts from rounds the
    committed ledger had seen (≤ its max recorded round). The round ritual
    still regenerates the ledger at round start to fold the new artifact in.
    """
    assert LEDGER == make_cumulative.build(max_round=max(LEDGER.values()))


def test_ledger_names_are_registered_queries():
    unknown = set(LEDGER) - set(QUERIES)
    assert not unknown, f"ledger names not in registry: {sorted(unknown)}"


def test_registry_exactly_tiled_by_accounting_lists():
    """Every registered query is either already driver-green, in this
    round's window, or explicitly queued for the next rotation — and the
    window prioritizes exactly the never-checked set."""
    registered = set(QUERIES)
    window = set(entrymod.CURATED_FIRST)
    queued = set(entrymod.QUEUED_FOR_NEXT_WINDOW)
    green = set(LEDGER)

    assert window <= registered, sorted(window - registered)
    assert queued <= registered, sorted(queued - registered)
    # window and next-round queue never overlap (a queued name would waste
    # a slot); queued names must be genuinely never-checked
    assert not (window & queued), sorted(window & queued)
    assert not (queued & green), sorted(queued & green)

    unaccounted = registered - green - window - queued
    assert not unaccounted, (
        f"queries absent from every accounting list (the r4 bug): "
        f"{sorted(unaccounted)}"
    )


def test_window_is_exactly_the_driver_slot_count():
    assert len(entrymod.CURATED_FIRST) == 50
    assert len(set(entrymod.CURATED_FIRST)) == 50, "duplicate window names"


def test_window_covers_every_never_checked_query():
    """This round's burn-down goal: all currently never-green names fit in
    the window (50 slots − anchors ≥ never-checked count). If a future
    round registers more than fit, this test forces an explicit queue
    entry instead of silent omission."""
    never = set(QUERIES) - set(LEDGER) - set(entrymod.QUEUED_FOR_NEXT_WINDOW)
    missing = never - set(entrymod.CURATED_FIRST)
    assert not missing, f"never-driver-checked but not in window: {sorted(missing)}"


def test_every_window_query_has_an_oracle():
    missing = [n for n in entrymod.CURATED_FIRST if n not in ORACLE]
    assert not missing, f"window queries without oracle SQL: {missing}"


def test_ordered_dict_puts_window_first():
    q = entrymod.queries()
    assert list(q)[:50] == entrymod.CURATED_FIRST
    o = entrymod.oracle_sql()
    assert list(o)[:50] == [n for n in entrymod.CURATED_FIRST if n in ORACLE]


def test_queued_queries_actually_run(spark):
    """Snapshot-commit gate (VERDICT r6 "Next round" #4): r6's final commit
    registered two queries that had never been EXECUTED — one crashed in
    both engines (ab_conversion_ztest's degenerate z denominator). Nothing
    may sit in QUEUED_FOR_NEXT_WINDOW without at least executing at
    sf0.001: each queued query must build a plan AND materialize rows
    without raising. Full value parity is covered for every registered
    query by tests/test_oracle_parity.py; this is the cheap always-on
    tripwire that a bare registration in a late commit cannot dodge.
    """
    sf = "/root/testdata/sf0.001"
    failures = []
    for name in entrymod.QUEUED_FOR_NEXT_WINDOW:
        try:
            QUERIES[name](spark, sf).collect()
        except Exception as exc:  # noqa: BLE001 - collecting all failures
            failures.append(f"{name}: {type(exc).__name__}: {exc}")
    assert not failures, "queued queries that cannot execute:\n" + "\n".join(
        failures
    )
