"""Round-11 tier tests: ADVICE r10 fixes first (degenerate-input guards
and semantic corrections for the r10 governance/measurement queries),
then the round-11 additions as they land. Cross-engine value parity for
every registered query runs in tests/test_oracle_parity.py; these pin
SEMANTICS against independent Python recomputation and the degenerate
branches no harness fixture reaches."""

from __future__ import annotations

import datetime as dt

import duckdb

from py_datalake_move_files_spark.functions.parity import canon_rows
from py_datalake_move_files_spark.queries import ORACLE, QUERIES

SF_SMALL = "/root/testdata/sf0.001"


def _mini_lake(spark, tmp_path, **tables):
    """Write a minimal lake dir holding only the given tables."""
    for name, (schema, rows) in tables.items():
        spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
            str(tmp_path / f"{name}.parquet")
        )
    return str(tmp_path)


def _duck_for(lake: str, *tables: str) -> duckdb.DuckDBPyConnection:
    """DuckDB connection over a Spark-written mini lake (part-file glob)."""
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{lake}/{t}.parquet/*.parquet')"
        )
    return con


# --------------------------------------------------------------------------
# profile_drift_report: empty-window guards (ADVICE r10 medium)
# --------------------------------------------------------------------------


_ORDERS_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string,"
    " o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)


def _orders_rows(day: dt.datetime, n: int = 5):
    return [
        (i, 100 + i % 3, "OF"[i % 2], 100.0 * (i + 1), day, f"{i % 2}-PRIO")
        for i in range(n)
    ]


def test_drift_report_empty_before_window_emits_null_not_abort(
    spark, tmp_path
):
    """Orders entirely AFTER the 1995-06-01 split: window A is empty, so
    distinct_a = rows_a = 0 and BOTH ratios must be NULL — under ANSI the
    unguarded `div 0` used to abort the Spark side while the oracle
    returned NULL (the exact parity split ADVICE r10 flagged)."""
    lake = _mini_lake(
        spark,
        tmp_path,
        orders=(_ORDERS_SCHEMA, _orders_rows(dt.datetime(1996, 1, 1))),
    )
    rows = QUERIES["profile_drift_report"](spark, lake).collect()
    assert len(rows) == 4
    for r in rows:
        assert r.rows_a == 0 and r.rows_b == 5
        assert r.distinct_ratio_ppm is None
        assert r.null_drift_ppm is None


def test_drift_report_empty_after_window_matches_oracle(spark, tmp_path):
    """Orders entirely BEFORE the split (empty window B): null_drift_ppm
    NULL, distinct_ratio 0 — and the full canonical row set matches the
    DuckDB oracle on the same degenerate lake."""
    lake = _mini_lake(
        spark,
        tmp_path,
        orders=(_ORDERS_SCHEMA, _orders_rows(dt.datetime(1994, 3, 1))),
    )
    df = QUERIES["profile_drift_report"](spark, lake)
    srows = [tuple(r) for r in df.collect()]
    for r in df.collect():
        assert r.rows_b == 0
        assert r.distinct_ratio_ppm == 0
        assert r.null_drift_ppm is None

    con = _duck_for(lake, "orders")
    cur = con.execute(ORACLE["profile_drift_report"])
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()
    assert canon_rows(df.columns, srows) == canon_rows(ocols, orows)
    con.close()


# --------------------------------------------------------------------------
# bpe_merge_candidates: repeated-pair-within-word type counting (ADVICE r10)
# --------------------------------------------------------------------------


_DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def test_bpe_repeated_pair_counts_word_type_once(spark, tmp_path):
    """A word with a repeated adjacent pair ('banana' -> 'an' at two
    slots) must count ONCE toward n_word_types while both slots count
    toward n_occurrences — the distinction the shipped corpus never
    exercises (ADVICE r10). Verified against the DuckDB oracle too."""
    lake = _mini_lake(
        spark,
        tmp_path,
        documents=(
            _DOCS_SCHEMA,
            [
                (1, "banana banana split", "en", "s", 19),
                (2, "ana banana", "en", "s", 10),
            ],
        ),
    )
    df = QUERIES["bpe_merge_candidates"](spark, lake)
    got = {r.pair: (r.n_occurrences, r.n_word_types) for r in df.collect()}
    # 'an': banana has 2 slots x 3 occurrences + ana has 1 slot x 1 = 7
    # occurrences, but only 2 word TYPES contain it
    assert got["an"] == (7, 2)
    assert got["na"] == (7, 2)
    assert got["ba"] == (3, 1)

    con = _duck_for(lake, "documents")
    cur = con.execute(ORACLE["bpe_merge_candidates"])
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()
    srows = [tuple(r) for r in df.collect()]
    assert canon_rows(df.columns, srows) == canon_rows(ocols, orows)
    con.close()


# --------------------------------------------------------------------------
# mann_whitney_u_events: all-values-tied variance-zero guard (ADVICE r10)
# --------------------------------------------------------------------------


_EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


def test_mwu_all_values_tied_emits_null_not_nan(spark, tmp_path):
    """Both groups present but every value identical: the tie-corrected
    variance is exactly 0, so z would be 0/0 = NaN in both engines — the
    guard must emit NULL instead (the module's NULL-never-NaN rule for
    degenerate inputs). U and the effect size stay well-defined."""
    rows = [
        (i, dt.datetime(2024, 1, 1, 0, 0, i), i % 3,
         "purchase" if i < 3 else "click", 42.0, "{}")
        for i in range(6)
    ]
    lake = _mini_lake(spark, tmp_path, events=(_EVENTS_SCHEMA, rows))
    df = QUERIES["mann_whitney_u_events"](spark, lake)
    row = df.collect()[0]
    assert row.n_a == 3 and row.n_b == 3
    assert row.u2_a == 9  # all ties: 2*U = n_a*n_b
    assert row.rank_biserial_ppm == 0
    assert row.z_stat is None

    con = _duck_for(lake, "events")
    cur = con.execute(ORACLE["mann_whitney_u_events"])
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()
    assert canon_rows(df.columns, [tuple(r) for r in df.collect()]) == (
        canon_rows(ocols, orows)
    )
    con.close()


def test_drift_report_nondegenerate_unchanged(spark):
    """The guard must not perturb the shipped-data result: ratios remain
    non-NULL on the harness lake where both windows are populated."""
    rows = QUERIES["profile_drift_report"](spark, SF_SMALL).collect()
    assert len(rows) == 4
    for r in rows:
        assert r.rows_a > 0 and r.rows_b > 0
        assert r.distinct_ratio_ppm is not None
        assert r.null_drift_ppm is not None
