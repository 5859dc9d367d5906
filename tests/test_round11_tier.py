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


# --------------------------------------------------------------------------
# round-11 measurement tier: independent Python recomputations
# --------------------------------------------------------------------------


def _docs(spark):
    from py_datalake_move_files_spark.catalog import load_table

    return load_table(spark, SF_SMALL, "documents").collect()


def test_vocab_coverage_matches_python(spark):
    from collections import Counter

    cnt = Counter(
        t for r in _docs(spark) for t in r.text.split(" ") if t != ""
    )
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(cnt.values())
    got = {r.k: r for r in QUERIES["vocab_coverage_curve"](spark, SF_SMALL).collect()}
    assert set(got) == {100, 1000, 10000}
    for k, row in got.items():
        covered = sum(c for _, c in ranked[:k])
        assert row.vocab_size == len(cnt)
        assert row.covered_tokens == covered
        assert row.coverage_ppm == covered * 1_000_000 // total


def test_fleiss_kappa_matches_python(spark):
    import math

    stop = set(
        __import__(
            "py_datalake_move_files_spark.operators.text", fromlist=["STOPWORDS"]
        ).STOPWORDS
    )
    cs = []
    for r in _docs(spark):
        toks = r.text.split(" ")
        c = (
            (len(toks) >= 40)
            + (sum(1 for t in toks if t in stop) * 5 >= len(toks))
            + (
                sum(1 for ch in r.text if not (ch.isalnum() or ch == " "))
                * 10
                <= len(r.text)
            )
        )
        cs.append(c)
    n = len(cs)
    s1 = sum(cs)
    s2 = sum(c * c + (3 - c) * (3 - c) for c in cs)
    pbar = (s2 - 3 * n) / (6 * n)
    pe = (s1 * s1 + (3 * n - s1) ** 2) / (9 * n * n)
    want = (pbar - pe) / (1 - pe)
    row = QUERIES["fleiss_kappa_raters"](spark, SF_SMALL).collect()[0]
    assert row.n_docs == n and row.votes_pos == s1
    assert math.isclose(row.fleiss_kappa, round(want, 6), abs_tol=2e-6)


def test_runs_test_matches_python(spark):
    import math
    from collections import defaultdict

    from py_datalake_move_files_spark.catalog import load_table

    ev = load_table(spark, SF_SMALL, "events").collect()
    daily = defaultdict(int)
    for r in ev:
        daily[r.ts.date()] += round(r.value * 1_000_000)
    days = sorted(daily)
    signs = []
    for a, b in zip(days, days[1:]):
        dx = daily[b] - daily[a]
        if dx != 0:
            signs.append(1 if dx > 0 else -1)
    runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
    n_up = signs.count(1)
    n_dn = signs.count(-1)
    n = len(signs)
    mu = 1.0 + 2.0 * n_up * n_dn / n
    var = (
        (2.0 * n_up * n_dn)
        * (2.0 * n_up * n_dn - n)
        / (float(n) * n * (n - 1.0))
    )
    row = QUERIES["runs_test_daily_events"](spark, SF_SMALL).collect()[0]
    assert (row.n_up, row.n_dn, row.runs) == (n_up, n_dn, runs)
    assert math.isclose(
        row.z_stat, round((runs - mu) / math.sqrt(var), 6), abs_tol=2e-6
    )


def test_page_hinkley_matches_python(spark):
    from collections import defaultdict

    from py_datalake_move_files_spark.catalog import load_table
    from py_datalake_move_files_spark.queries_measure import (
        _PH_DELTA_MICRO,
        _PH_LAMBDA_MICRO,
    )

    ev = load_table(spark, SF_SMALL, "events").collect()
    s = defaultdict(int)
    nn = defaultdict(int)
    for r in ev:
        d = r.ts.date()
        s[d] += round(r.value * 1_000_000)
        nn[d] += 1
    days = sorted(s)
    xs = [s[d] // nn[d] for d in days]
    got = QUERIES["page_hinkley_daily_events"](spark, SF_SMALL).collect()
    assert [r.day for r in got] == days
    cum = 0
    uu = 0
    umin = 0
    for i, (d, row) in enumerate(zip(days, got)):
        cum += xs[i]
        mu = cum // (i + 1)
        uu += xs[i] - mu - _PH_DELTA_MICRO
        umin = min(umin, uu)
        ph = uu - umin
        assert row.day_mean_micro == xs[i]
        assert row.ph_micro == ph
        assert row.alarm == (ph > _PH_LAMBDA_MICRO)


def test_isotropy_matches_bruteforce_pairs(spark):
    import math

    from py_datalake_move_files_spark.catalog import load_table

    emb = load_table(spark, SF_SMALL, "embeddings").collect()
    us = []
    for r in emb:
        nrm2 = 0.0
        for v in r.embedding:
            nrm2 = nrm2 + float(v) * float(v)
        if nrm2 > 0:
            nrm = math.sqrt(nrm2)
            us.append(
                [round(float(v) / nrm * 1_000_000) for v in r.embedding]
            )
    n = len(us)
    # Gram identity recomputed directly (the exact integers the query sums)
    dim = len(us[0])
    sd = [sum(u[i] for u in us) for i in range(dim)]
    ss = sum(x * x for x in sd)
    sq = sum(x * x for u in us for x in u)
    want = round((ss - sq) / (n * (n - 1.0)) / 1e12, 6)
    row = QUERIES["embedding_isotropy_stats"](spark, SF_SMALL).collect()[0]
    assert row.n_vecs == n and row.dim == dim
    assert row.mean_pairwise_cos == want
    # and the identity really equals the O(N^2) mean pairwise cosine
    brute = sum(
        sum(a * b for a, b in zip(u, w))
        for i, u in enumerate(us)
        for j, w in enumerate(us)
        if i != j
    )
    assert ss - sq == brute


def test_brier_bins_match_python(spark):
    from py_datalake_move_files_spark.catalog import load_table

    orders = load_table(spark, SF_SMALL, "orders").collect()
    rows = []
    for r in orders:
        p = min(max(0.5 + (r.o_totalprice - 150000.0) / 600000.0, 0.0), 1.0)
        pm = round(p * 1_000_000)
        y = 1 if r.o_orderstatus == "F" else 0
        rows.append((min(pm // 100_000, 9), pm, y))
    total_sq = sum((pm - y * 1_000_000) ** 2 for _, pm, y in rows)
    brier = total_sq // (len(rows) * 1_000_000)
    got = QUERIES["brier_calibration_bins"](spark, SF_SMALL).collect()
    bins = {}
    for b, pm, y in rows:
        n, sp, sy = bins.get(b, (0, 0, 0))
        bins[b] = (n + 1, sp + pm, sy + y)
    assert {r.bin for r in got} == set(bins)
    for r in got:
        n, sp, sy = bins[r.bin]
        assert r.n_orders == n
        assert r.mean_pred_ppm == sp // n
        assert r.event_rate_ppm == sy * 1_000_000 // n
        assert r.brier_ppm == brier


def test_grubbs_matches_python(spark):
    import math

    from py_datalake_move_files_spark.catalog import load_table

    orders = load_table(spark, SF_SMALL, "orders").collect()
    pc = {r.o_orderkey: round(r.o_totalprice * 100) for r in orders}
    n = len(pc)
    sp = sum(pc.values())
    spp = sum(v * v for v in pc.values())
    key = min(pc, key=lambda k: (-abs(pc[k] * n - sp), k))
    var = (spp - sp * sp / n) / (n - 1.0)
    want_g = round((abs(pc[key] * n - sp) / n) / math.sqrt(var), 6)
    row = QUERIES["grubbs_outlier_prices"](spark, SF_SMALL).collect()[0]
    assert row.n_orders == n
    assert row.outlier_orderkey == key
    assert math.isclose(row.g_stat, want_g, abs_tol=2e-6)
