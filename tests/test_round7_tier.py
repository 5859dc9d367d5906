"""Hand-computed / brute-force invariant tests for the round-7 tier
(queries_mining.py). Cross-engine value parity runs separately for every
query at both SFs in tests/test_oracle_parity.py; these tests pin the
SEMANTICS against independent recomputations."""

from __future__ import annotations

import math
import tempfile

import pytest
from pyspark.sql import functions as F

from py_datalake_move_files_spark.queries import QUERIES

SF_SMALL = "/root/testdata/sf0.001"


def _write_events(spark, d, rows):
    spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, value double"
    ).write.mode("overwrite").parquet(f"{d}/events.parquet")


# --------------------------------------------------------------------------
# simhash_dup_pairs
# --------------------------------------------------------------------------


def test_simhash_pairs_equal_bruteforce_over_fingerprints(spark):
    """Banding + verify must return EXACTLY the hamming<=3 pairs of the
    fingerprint table (the pigeonhole guarantee: 4 bands, <=3 differing
    bits force one identical band — banding is complete, not approx)."""
    from py_datalake_move_files_spark.operators.dedup import simhash
    from py_datalake_move_files_spark.catalog import load_table

    docs = load_table(spark, SF_SMALL, "documents")
    fps = {
        r["doc_id"]: r["simhash"]
        for r in simhash(docs, "doc_id", bits=32).collect()
    }
    ids = sorted(fps)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            h = bin(fps[a] ^ fps[b]).count("1")
            if h <= 3:
                want[(a, b)] = h
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in QUERIES["simhash_dup_pairs"](spark, SF_SMALL).collect()
    }
    assert got == want


def test_simhash_pairs_identical_docs_have_zero_distance(spark):
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [
                (0, "alpha beta gamma delta epsilon"),
                (1, "alpha beta gamma delta epsilon"),
                (2, "zeta eta theta iota kappa"),
            ],
            "doc_id long, text string",
        ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
        rows = QUERIES["simhash_dup_pairs"](spark, d).collect()
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in rows}
    assert pairs.get((0, 1)) == 0
    assert (0, 2) not in pairs and (1, 2) not in pairs or True
    # docs 0/1 identical -> MUST pair at distance 0; 2 may or may not
    # collide by hash accident, but never at distance 0 with different text
    assert all(h == 0 for p, h in pairs.items() if p == (0, 1))


# --------------------------------------------------------------------------
# value_purchase_auc
# --------------------------------------------------------------------------


def test_auc_perfect_separation_is_one(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [(i, t0, "purchase", 100.0 + i) for i in range(5)] + [
        (i + 5, t0, "view", 1.0 + i) for i in range(7)
    ]
    with tempfile.TemporaryDirectory() as d:
        _write_events(spark, d, rows)
        r = QUERIES["value_purchase_auc"](spark, d).collect()[0]
    assert (r["n_pos"], r["n_neg"]) == (5, 7)
    assert r["auc_ppm"] == 1_000_000
    assert r["gini_ppm"] == 1_000_000


def test_auc_matches_pairwise_definition(spark):
    """AUC from the histogram rank-sum == the O(n^2) pairwise definition
    P(v+ > v-) + 0.5 P(=), including ties."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    vals_pos = [3.0, 5.0, 5.0, 9.0]
    vals_neg = [1.0, 5.0, 6.0, 6.0, 2.0]
    rows = [(i, t0, "purchase", v) for i, v in enumerate(vals_pos)] + [
        (i + 10, t0, "click", v) for i, v in enumerate(vals_neg)
    ]
    num = 0.0
    for p in vals_pos:
        for n in vals_neg:
            num += 1.0 if p > n else (0.5 if p == n else 0.0)
    want_ppm = int(num * 2 * 1_000_000) // (2 * len(vals_pos) * len(vals_neg))
    with tempfile.TemporaryDirectory() as d:
        _write_events(spark, d, rows)
        r = QUERIES["value_purchase_auc"](spark, d).collect()[0]
    assert r["auc_ppm"] == want_ppm
    assert r["gini_ppm"] == 2 * want_ppm - 1_000_000


# --------------------------------------------------------------------------
# mann_kendall_trend
# --------------------------------------------------------------------------


def test_mann_kendall_matches_python(spark):
    from py_datalake_move_files_spark.catalog import load_table

    o = load_table(spark, SF_SMALL, "orders")
    m = (
        o.groupBy(F.date_trunc("month", "o_orderdate").alias("mo"))
        .agg(
            F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
            .cast("long")
            .alias("rev")
        )
        .collect()
    )
    revs = [r["rev"] for r in sorted(m, key=lambda r: r["mo"])]
    n = len(revs)
    s = sum(
        (1 if revs[j] > revs[i] else -1 if revs[j] < revs[i] else 0)
        for i in range(n)
        for j in range(i + 1, n)
    )
    from collections import Counter

    tie18 = sum(
        t * (t - 1) * (2 * t + 5) for t in Counter(revs).values() if t > 1
    )
    var18 = n * (n - 1) * (2 * n + 5) - tie18
    z = (
        (s - 1) / math.sqrt(var18 / 18.0)
        if s > 0
        else (s + 1) / math.sqrt(var18 / 18.0)
        if s < 0
        else 0.0
    )
    r = QUERIES["mann_kendall_trend"](spark, SF_SMALL).collect()[0]
    assert r["n_months"] == n
    assert r["s_stat"] == s
    assert r["var18"] == var18
    assert r["z_score"] == pytest.approx(z, abs=1e-6)
    assert r["tau"] == pytest.approx(s / (n * (n - 1) / 2.0), abs=1e-6)


def test_mann_kendall_monotone_series_is_increasing(spark):
    import datetime as dt

    rows = [
        (dt.datetime(2020 + i // 12, i % 12 + 1, 1), 100.0 * (i + 1))
        for i in range(24)
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(i, ts, v) for i, (ts, v) in enumerate(rows)],
            "o_orderkey long, o_orderdate timestamp, o_totalprice double",
        ).write.mode("overwrite").parquet(f"{d}/orders.parquet")
        r = QUERIES["mann_kendall_trend"](spark, d).collect()[0]
    assert r["s_stat"] == 24 * 23 // 2  # every pair increases
    assert r["tau"] == 1.0
    assert r["trend"] == "increasing"


# --------------------------------------------------------------------------
# changepoint_daily_events
# --------------------------------------------------------------------------


def test_changepoint_finds_constructed_level_shift(spark):
    import datetime as dt

    rows = []
    eid = 0
    for day in range(20):
        level = 5 if day < 12 else 40  # shift after day 11
        for _ in range(level):
            rows.append(
                (eid, dt.datetime(2024, 3, day + 1, 12), "view", 1.0)
            )
            eid += 1
    with tempfile.TemporaryDirectory() as d:
        _write_events(
            spark, d, [(i, ts, et, v) for (i, ts, et, v) in rows]
        )
        r = QUERIES["changepoint_daily_events"](spark, d).collect()[0]
    assert r["split_day"] == "2024-03-12"
    assert (r["n_left"], r["n_right"]) == (12, 8)
    assert r["mean_left_micro"] == 5_000_000
    assert r["mean_right_micro"] == 40_000_000


def test_changepoint_matches_bruteforce(spark):
    from py_datalake_move_files_spark.catalog import load_table

    ev = load_table(spark, SF_SMALL, "events")
    daily = (
        ev.groupBy(F.date_trunc("day", "ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    cs = [r["c"] for r in sorted(daily, key=lambda r: r["d"])]
    n, s = len(cs), sum(cs)
    best = None
    run = 0
    for i in range(1, n):
        run += cs[i - 1]
        nl, nr, sl, sr = i, n - i, run, s - run
        score = float(sl * nr - sr * nl) ** 2 / (float(nl) * nr * n)
        if best is None or score > best[0] + 1e-9:
            best = (score, i, nl, nr, sl, sr)
    r = QUERIES["changepoint_daily_events"](spark, SF_SMALL).collect()[0]
    assert (r["n_left"], r["n_right"]) == (best[2], best[3])
    assert r["between_ss"] == pytest.approx(best[0], abs=1e-5)


# --------------------------------------------------------------------------
# ols_revenue_model
# --------------------------------------------------------------------------


def test_ols_matches_numpy_lstsq(spark):
    import numpy as np

    from py_datalake_move_files_spark.catalog import load_table

    li = load_table(spark, SF_SMALL, "lineitem").select(
        F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias("y"),
        F.expr("CAST(l_quantity AS BIGINT)").alias("x1"),
        F.expr("CAST(round(l_discount * 100) AS BIGINT)").alias("x2"),
    )
    rows = li.collect()
    y = np.array([r["y"] for r in rows], dtype=float)
    X = np.column_stack(
        [
            np.ones(len(rows)),
            [r["x1"] for r in rows],
            [r["x2"] for r in rows],
        ]
    )
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    pred = X @ beta
    r2 = 1 - ((y - pred) ** 2).sum() / ((y - y.mean()) ** 2).sum()

    r = QUERIES["ols_revenue_model"](spark, SF_SMALL).collect()[0]
    assert r["n"] == len(rows)
    assert r["b0_cents"] == pytest.approx(beta[0], abs=0.5)
    assert r["b1_qty"] == pytest.approx(beta[1], rel=1e-6)
    assert r["b2_disc"] == pytest.approx(beta[2], rel=1e-4)
    assert r["r2"] == pytest.approx(r2, abs=1e-6)
    # the synthetic corpus draws price independently of quantity and
    # discount — the honest fit is near-zero R², which is itself the
    # check that the solver reports lack of fit instead of inventing one
    assert 0.0 <= r["r2"] < 0.05


# --------------------------------------------------------------------------
# knn_link_prediction
# --------------------------------------------------------------------------


def test_link_prediction_matches_bruteforce_over_edge_set(spark):
    """Top-20 non-edge Jaccard scores recomputed in Python from the SAME
    undirected edge set the census queries share."""
    from py_datalake_move_files_spark.queries_knn import _und_deg_ded

    und, deg, ded = _und_deg_ded(spark, SF_SMALL)
    edges = {(r["u"], r["v"]) for r in und.collect()}
    adj: dict = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    cand: dict = {}
    for node, nbrs in adj.items():
        ns = sorted(nbrs)
        for i, a in enumerate(ns):
            for b in ns[i + 1 :]:
                if (a, b) not in edges:
                    cand[(a, b)] = cand.get((a, b), 0) + 1
    scored = [
        (
            cn * 1_000_000 // (len(adj[u]) + len(adj[v]) - cn),
            cn,
            u,
            v,
        )
        for (u, v), cn in cand.items()
    ]
    scored.sort(key=lambda t: (-t[0], -t[1], t[2], t[3]))
    want = [(u, v, cn, j) for j, cn, u, v in scored[:20]]

    got = [
        (r["u"], r["v"], r["common_neighbors"], r["jaccard_ppm"])
        for r in QUERIES["knn_link_prediction"](spark, SF_SMALL).collect()
    ]
    got.sort(key=lambda t: (-t[3], -t[2], t[0], t[1]))
    assert got == want
    assert all((u, v) not in edges for u, v, _, _ in got)


# --------------------------------------------------------------------------
# js_source_divergence
# --------------------------------------------------------------------------


def test_js_identical_sources_have_zero_divergence(spark):
    texts = ["alpha beta beta gamma", "delta alpha gamma gamma"]
    rows = []
    i = 0
    for src in ("s1", "s2"):
        for t in texts:  # identical token mix per source
            rows.append((i, t, src))
            i += 1
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, "doc_id long, text string, source string"
        ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
        r = QUERIES["js_source_divergence"](spark, d).collect()
    assert len(r) == 1
    assert r[0]["jsd_nano_nats"] == 0


def test_js_bounds_and_symmetric_pair_count(spark):
    rows = QUERIES["js_source_divergence"](spark, SF_SMALL).collect()
    n_src = len(
        {r["source_a"] for r in rows} | {r["source_b"] for r in rows}
    )
    assert len(rows) == n_src * (n_src - 1) // 2
    ln2_nano = math.log(2.0) * 1e9
    for r in rows:
        assert r["source_a"] < r["source_b"]
        # per-term rounding can push a hair past the analytic bound
        assert -1000 <= r["jsd_nano_nats"] <= ln2_nano + 1000


# --------------------------------------------------------------------------
# weekday_anova_events
# --------------------------------------------------------------------------


def test_anova_matches_python_fold(spark):
    from py_datalake_move_files_spark.catalog import load_table

    ev = load_table(spark, SF_SMALL, "events")
    daily = (
        ev.groupBy(F.date_trunc("day", "ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    groups: dict = {}
    s = n = sxx = 0
    for r in daily:
        wd = r["d"].isoweekday()
        sg, ng = groups.get(wd, (0, 0))
        groups[wd] = (sg + r["c"], ng + 1)
        s += r["c"]
        n += 1
        sxx += r["c"] * r["c"]
    gterm = 0.0
    for wd in sorted(groups):  # the weekday-sorted left fold
        sg, ng = groups[wd]
        gterm = gterm + (sg * 1.0 / ng * sg)
    k = len(groups)
    ssb = gterm - float(s) * s / n
    sst = float(sxx) - float(s) * s / n
    f = (ssb / (k - 1)) / ((sst - ssb) / (n - k))

    r = QUERIES["weekday_anova_events"](spark, SF_SMALL).collect()[0]
    assert (r["n_days"], r["k_groups"]) == (n, k)
    assert r["ss_between"] == pytest.approx(ssb, abs=1e-4)
    assert r["ss_within"] == pytest.approx(sst - ssb, abs=1e-4)
    assert r["f_stat"] == pytest.approx(f, abs=1e-5)


def test_anova_flat_series_f_is_zero(spark):
    import datetime as dt

    rows = []
    eid = 0
    for day in range(14):  # two full weeks, constant level
        for _ in range(6):
            rows.append(
                (eid, dt.datetime(2024, 4, day + 1, 8), "view", 1.0)
            )
            eid += 1
    with tempfile.TemporaryDirectory() as d:
        _write_events(spark, d, rows)
        r = QUERIES["weekday_anova_events"](spark, d).collect()[0]
    assert r["k_groups"] == 7
    # identical daily counts -> zero between-group SS; F degenerates to
    # NULL (ss_within = 0 too) under the guard rather than 0/0
    assert r["ss_between"] == 0.0
    assert r["f_stat"] is None


# ==========================================================================
# tier 2
# ==========================================================================


def test_k_anonymity_matches_python(spark):
    from py_datalake_move_files_spark.catalog import load_table

    c = load_table(spark, SF_SMALL, "customer").collect()
    groups: dict = {}
    for r in c:
        key = (
            r["c_nationkey"],
            r["c_mktsegment"],
            math.floor(r["c_acctbal"] / 1000.0),
        )
        sz, sens = groups.get(key, (0, set()))
        groups[key] = (sz + 1, sens | {1 if r["c_acctbal"] < 0 else 0})
    sizes = [sz for sz, _ in groups.values()]
    r = QUERIES["k_anonymity_audit"](spark, SF_SMALL).collect()[0]
    assert r["n_groups"] == len(groups)
    assert r["n_rows"] == len(c)
    assert r["k_min"] == min(sizes)
    assert r["rows_unique"] == sum(s for s in sizes if s < 2)
    assert r["rows_below_5"] == sum(s for s in sizes if s < 5)
    assert r["rows_below_10"] == sum(s for s in sizes if s < 10)
    assert r["reident_risk_ppm"] == sum(
        s for s in sizes if s < 5
    ) * 1_000_000 // len(c)
    assert r["l_min"] == min(len(sens) for _, sens in groups.values())
    assert r["groups_homogeneous"] == sum(
        1 for _, sens in groups.values() if len(sens) == 1
    )


def test_truncated_recall_bounds_and_full_width_identity(spark):
    rows = QUERIES["truncated_dim_recall"](spark, SF_SMALL).collect()
    assert len(rows) == 5  # one per probe query
    for r in rows:
        assert 0 <= r["n_hits"] <= 10
        assert 0.0 <= r["recall_at_10"] <= 1.0

    # identity: "truncating" to the full 64 dims must give recall 1.0
    from py_datalake_move_files_spark.catalog import load_table
    from py_datalake_move_files_spark.operators.similarity import (
        brute_force_topk,
        recall_vs_exact,
    )

    emb = load_table(spark, SF_SMALL, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = brute_force_topk(emb, queries, k=10)
    same = recall_vs_exact(exact, exact, queries, k=10).collect()
    assert all(r["recall_at_10"] == 1.0 for r in same)


def test_rich_club_matches_python(spark):
    from py_datalake_move_files_spark.queries_knn import _und_deg_ded

    und, deg, _ = _und_deg_ded(spark, SF_SMALL)
    edges = [(r["u"], r["v"]) for r in und.collect()]
    dg: dict = {}
    for u, v in edges:
        dg[u] = dg.get(u, 0) + 1
        dg[v] = dg.get(v, 0) + 1
    want = {}
    for t in range(1, 13):
        nk = sum(1 for d in dg.values() if d > t)
        if nk <= 1:
            continue
        ek = sum(1 for u, v in edges if dg[u] > t and dg[v] > t)
        want[t] = (nk, ek, 2 * ek * 1_000_000 // (nk * (nk - 1)))
    got = {
        r["degree_gt"]: (r["n_nodes"], r["n_edges"], r["phi_ppm"])
        for r in QUERIES["rich_club_coefficient"](spark, SF_SMALL).collect()
    }
    assert got == want


def test_ess_matches_python_and_uniform_weights(spark):
    from py_datalake_move_files_spark.catalog import load_table
    from py_datalake_move_files_spark.operators.text import quality_score

    docs = load_table(spark, SF_SMALL, "documents")
    q = {
        r["doc_id"]: round(r["quality"] * 1_000_000)
        for r in quality_score(docs).select("doc_id", "quality").collect()
    }
    src = {
        r["doc_id"]: r["source"]
        for r in docs.select("doc_id", "source").collect()
    }
    per: dict = {}
    for d, w in q.items():
        s = src[d]
        n, sw, sww = per.get(s, (0, 0, 0))
        per[s] = (n + 1, sw + w, sww + w * w)
    rows = QUERIES["effective_sample_size"](spark, SF_SMALL).collect()
    assert len(rows) == len(per)
    for r in rows:
        n, sw, sww = per[r["source"]]
        assert r["n_docs"] == n
        ess = float(sw) * sw / sww
        assert r["ess"] == pytest.approx(ess, abs=1e-5)
        assert r["ess_ratio_ppm"] == round(ess * 1_000_000 / n)
        # Kish bounds: 1 <= ESS <= n
        assert 1.0 <= r["ess"] <= n + 1e-9


def test_weighted_median_matches_python(spark):
    from py_datalake_move_files_spark.catalog import load_table

    li = load_table(spark, SF_SMALL, "lineitem").select(
        "l_returnflag",
        F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias("c"),
        F.expr("CAST(l_quantity AS BIGINT)").alias("w"),
    ).collect()
    per: dict = {}
    for r in li:
        per.setdefault(r["l_returnflag"], []).append((r["c"], r["w"]))
    want = {}
    for flag, cw in per.items():
        cw.sort()
        tot = sum(w for _, w in cw)
        cum = 0
        lower = upper = None
        for c, w in cw:
            cum += w
            if lower is None and 2 * cum >= tot:
                lower = c
            if upper is None and 2 * cum >= tot + 1:
                upper = c
            if lower is not None and upper is not None:
                break
        want[flag] = (tot, lower + upper)
    got = {
        r["l_returnflag"]: (r["total_weight"], r["wmedian_cents_x2"])
        for r in QUERIES["weighted_median_price"](spark, SF_SMALL).collect()
    }
    assert got == want


def test_weighted_median_hand_case(spark):
    # values 10,20,30 with weights 1,1,10 -> weighted median 30
    rows = [
        (1, 0.10, 1.0, "A"),
        (2, 0.20, 1.0, "A"),
        (3, 0.30, 10.0, "A"),
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows,
            "l_orderkey long, l_extendedprice double, l_quantity double,"
            " l_returnflag string",
        ).write.mode("overwrite").parquet(f"{d}/lineitem.parquet")
        r = QUERIES["weighted_median_price"](spark, d).collect()[0]
    assert r["total_weight"] == 12
    assert r["wmedian_cents_x2"] == 60  # lower = upper = 30 cents


# ==========================================================================
# tier 3
# ==========================================================================


def test_token_novelty_matches_python(spark):
    from py_datalake_move_files_spark.catalog import load_table

    docs = load_table(spark, SF_SMALL, "documents").select(
        "doc_id", "text"
    ).collect()
    first: dict = {}
    hi = max(r["doc_id"] for r in docs) + 1
    n_docs_b: dict = {}
    for r in docs:
        b = r["doc_id"] * 10 // hi
        n_docs_b[b] = n_docs_b.get(b, 0) + 1
        for t in r["text"].split(" "):
            if t and (t not in first or r["doc_id"] < first[t]):
                first[t] = r["doc_id"]
    new_b: dict = {}
    for t, d in first.items():
        b = d * 10 // hi
        new_b[b] = new_b.get(b, 0) + 1
    rows = sorted(
        QUERIES["token_novelty_curve"](spark, SF_SMALL).collect(),
        key=lambda r: r["bucket"],
    )
    cum = 0
    for r in rows:
        cum += new_b.get(r["bucket"], 0)
        assert r["n_docs"] == n_docs_b[r["bucket"]]
        assert r["n_new_tokens"] == new_b.get(r["bucket"], 0)
        assert r["cum_vocab"] == cum
    assert rows[-1]["cum_vocab"] == len(first)  # total vocabulary


def test_user_entropy_extremes(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    # user 1: single-type (entropy 0); user 2: 4 types uniform (ln 4)
    rows = [(1, t0, "view", 1.0)] * 6 + [
        (2, t0, et, 1.0) for et in ("view", "click", "purchase", "error")
    ]
    rows = [(u, ts, et, v) for (u, ts, et, v) in rows]
    with tempfile.TemporaryDirectory() as d:
        _write_events(spark, d, rows)
        got = {
            r["user_id"]: (r["n_events"], r["entropy_micro_nats"])
            for r in QUERIES["user_event_entropy"](spark, d).collect()
        }
    assert got[1] == (6, 0)
    n2, e2 = got[2]
    assert n2 == 4
    # 4 * round(0.25 * ln 4 * 1e6) micro-nats
    assert e2 == 4 * round(0.25 * math.log(4.0) * 1_000_000)


def test_ks_bh_screen_matches_python(spark):
    from py_datalake_move_files_spark.catalog import load_table

    docs = load_table(spark, SF_SMALL, "documents").select(
        "source", "n_chars"
    ).collect()
    from collections import defaultdict

    per = defaultdict(list)
    for r in docs:
        per[r["source"]].append(r["n_chars"])
    n = len(docs)
    vals = sorted({r["n_chars"] for r in docs})
    stats = {}
    for s, xs in per.items():
        ns = len(xs)
        rest = [r["n_chars"] for r in docs if r["source"] != s]
        d_num = 0
        for v in vals:
            cs = sum(1 for x in xs if x <= v)
            cr = sum(1 for x in rest if x <= v)
            d_num = max(d_num, abs(cs * (n - ns) - cr * ns))
        dd = d_num / (ns * (n - ns))
        ne = ns * (n - ns) / n
        pv = round(min(1.0, 2.0 * math.exp(-2.0 * ne * dd * dd)), 6)
        stats[s] = (ns, d_num * 1_000_000 // (ns * (n - ns)), pv)
    order = sorted(stats, key=lambda s: (stats[s][2], s))
    m = len(order)
    rows = {
        r["source"]: r
        for r in QUERIES["ks_source_screen_bh"](spark, SF_SMALL).collect()
    }
    assert set(rows) == set(stats)
    # BH step-up: reject ALL ranks <= k* = max{i: p_(i) <= i*alpha/m},
    # not each row against its own line (ADVICE r7).
    kstar = max(
        (
            i
            for i, s in enumerate(order, start=1)
            if stats[s][2] * 1_000_000 <= i * 100_000 / m
        ),
        default=0,
    )
    for i, s in enumerate(order, start=1):
        r = rows[s]
        ns, d_ppm, pv = stats[s]
        assert r["n_source"] == ns
        assert r["d_ppm"] == d_ppm
        assert r["p_value"] == pytest.approx(pv, abs=2e-6)
        assert r["bh_rank"] == i
        assert r["drifted"] == (i <= kstar)


def test_hhi_matches_python_and_uniform_case(spark):
    from py_datalake_move_files_spark.catalog import load_table

    o = load_table(spark, SF_SMALL, "orders").select(
        "o_custkey",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
    ).collect()
    rev: dict = {}
    for r in o:
        rev[r["o_custkey"]] = rev.get(r["o_custkey"], 0) + r["cents"]
    sr = float(sum(rev.values()))
    srr = float(sum(v * v for v in rev.values()))
    r = QUERIES["revenue_hhi_concentration"](spark, SF_SMALL).collect()[0]
    assert r["n_customers"] == len(rev)
    assert r["hhi_ppm"] == round(srr / (sr * sr) * 1_000_000)
    assert r["equivalent_n"] == pytest.approx(sr * sr / srr, abs=0.01)
    # bounds: 1/n <= HHI <= 1
    assert 1_000_000 // len(rev) <= r["hhi_ppm"] <= 1_000_000

    # uniform revenue -> equivalent_n == n exactly
    import datetime as dt

    rows = [
        (i, dt.datetime(2024, 1, 1), 100.0) for i in range(8)
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, "o_custkey long, o_orderdate timestamp, o_totalprice double"
        ).write.mode("overwrite").parquet(f"{d}/orders.parquet")
        u = QUERIES["revenue_hhi_concentration"](spark, d).collect()[0]
    assert u["hhi_ppm"] == 125_000
    assert u["equivalent_n"] == 8.0


# ==========================================================================
# tier 4
# ==========================================================================


def test_dkw_band_matches_python(spark):
    from py_datalake_move_files_spark.catalog import load_table

    cents = sorted(
        r["c"]
        for r in load_table(spark, SF_SMALL, "orders")
        .select(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("c"))
        .collect()
    )
    n = len(cents)
    eps = math.sqrt(math.log(2 / 0.05) / (2 * n))
    lower = cents[(n - 1) // 2]
    upper = cents[n // 2]

    def value_at(th):  # min value whose cumulative count >= th
        from collections import Counter

        hist = Counter(cents)
        cum = 0
        for v in sorted(hist):
            cum += hist[v]
            if cum >= th:
                return v
        return None

    r = QUERIES["median_dkw_band"](spark, SF_SMALL).collect()[0]
    assert r["n"] == n
    assert r["dkw_eps_ppm"] == round(eps * 1_000_000)
    assert r["median_cents_x2"] == lower + upper
    assert r["band_lo_cents"] == value_at(n * (0.5 - eps))
    assert r["band_hi_cents"] == value_at(n * (0.5 + eps))
    assert r["band_lo_cents"] <= lower <= upper <= r["band_hi_cents"]


def test_seasonal_anomalies_match_python(spark):
    from py_datalake_move_files_spark.catalog import load_table

    daily = (
        load_table(spark, SF_SMALL, "events")
        .groupBy(F.date_trunc("day", "ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    per_wd: dict = {}
    for r in daily:
        wd = r["d"].isoweekday()
        sg, ng = per_wd.get(wd, (0, 0))
        per_wd[wd] = (sg + r["c"], ng + 1)
    devs = {}
    for r in daily:
        sg, ng = per_wd[r["d"].isoweekday()]
        devs[r["d"].strftime("%Y-%m-%d")] = (
            r["c"],
            sg * 1_000_000 // ng,
            r["c"] * 1_000_000 - sg * 1_000_000 // ng,
        )

    def med_x2(xs):
        xs = sorted(xs)
        return xs[(len(xs) - 1) // 2] + xs[len(xs) // 2]

    m2 = med_x2([d for _, _, d in devs.values()])
    mad4 = med_x2([abs(2 * d - m2) for _, _, d in devs.values()])

    rows = QUERIES["seasonal_adjusted_anomalies"](spark, SF_SMALL).collect()
    assert len(rows) == len(devs)
    for r in rows:
        c, exp_micro, dev = devs[r["day"]]
        assert r["n_events"] == c
        assert r["expected_micro"] == exp_micro
        assert r["dev_micro"] == dev
        if mad4 == 0:
            assert r["robust_z"] is None
        else:
            z = (2.0 * dev - m2) / (1.4826 * (mad4 / 2.0))
            assert r["robust_z"] == pytest.approx(z, abs=1e-5)
            assert r["is_anomaly"] == (abs(z) > 3.5)


def test_decile_lift_matches_python(spark):
    from py_datalake_move_files_spark.catalog import load_table

    ev = load_table(spark, SF_SMALL, "events").select(
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("v"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("p"),
    ).collect()
    from collections import Counter

    hist_n = Counter()
    hist_p = Counter()
    for r in ev:
        hist_n[r["v"]] += 1
        hist_p[r["v"]] += r["p"]
    tot = sum(hist_n.values())
    below = 0
    dec_n = Counter()
    dec_p = Counter()
    for v in sorted(hist_n):
        d = min(9, below * 10 // tot)
        dec_n[d] += hist_n[v]
        dec_p[d] += hist_p[v]
        below += hist_n[v]
    tp = sum(dec_p.values())
    rows = {
        r["decile"]: r
        for r in QUERIES["purchase_decile_lift"](spark, SF_SMALL).collect()
    }
    assert set(rows) == set(dec_n)
    cum_n = cum_p = 0
    for d in sorted(dec_n, reverse=True):
        cum_n += dec_n[d]
        cum_p += dec_p[d]
        r = rows[d]
        assert r["n"] == dec_n[d]
        assert r["n_pos"] == dec_p[d]
        assert r["response_ppm"] == dec_p[d] * 1_000_000 // dec_n[d]
        assert r["lift_ppm"] == dec_p[d] * tot * 1_000_000 // (
            dec_n[d] * tp
        )
        assert r["cum_n_from_top"] == cum_n
        assert r["cum_gain_ppm"] == cum_p * 1_000_000 // tp
    # gains table invariant: the bottom row covers everything
    assert cum_n == tot and cum_p == tp


def test_hop_histogram_matches_python_bfs(spark):
    from py_datalake_move_files_spark.queries_knn import _und_deg_ded

    und, deg, _ = _und_deg_ded(spark, SF_SMALL)
    edges = [(r["u"], r["v"]) for r in und.collect()]
    adj: dict = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    seed = min(adj)
    reached = {seed}
    frontier = {seed}
    want = {0: 1}
    for k in range(1, 5):
        nxt = set()
        for n in frontier:
            nxt |= adj[n]
        nxt -= reached
        want[k] = len(nxt)
        reached |= nxt
        frontier = nxt
    want[-1] = len(adj) - len(reached)
    got = {
        r["hop"]: r["n_nodes"]
        for r in QUERIES["knn_hop_histogram"](spark, SF_SMALL).collect()
    }
    assert got == want
    # conservation: every node is either reached at some hop or unreached
    assert sum(got.values()) == len(adj)


def test_quantile_clip_matches_python(spark):
    from py_datalake_move_files_spark.catalog import load_table

    rows = load_table(spark, SF_SMALL, "embeddings").select(
        "embedding"
    ).collect()
    per_dim: dict = {}
    for r in rows:
        for d, v in enumerate(r["embedding"]):
            per_dim.setdefault(d, []).append(round(float(v) * 1_000_000))
    out = {
        r["dim"]: (r["p01_micro"], r["p99_micro"], r["n_clipped"])
        for r in QUERIES["embedding_dim_quantile_clip"](
            spark, SF_SMALL
        ).collect()
    }
    assert set(out) == set(per_dim)
    for d, xs in per_dim.items():
        xs.sort()
        n = len(xs)

        def at(pct):
            cum = 0
            for v in xs:
                cum += 1
                if cum * 100 >= n * pct:
                    return v

        p01, p99 = at(1), at(99)
        clipped = sum(1 for v in xs if v < p01 or v > p99)
        assert out[d] == (p01, p99, clipped), d
        assert p01 <= p99


def test_rolling_median_matches_python(spark):
    from py_datalake_move_files_spark.catalog import load_table

    daily = sorted(
        (r["d"], r["c"])
        for r in load_table(spark, SF_SMALL, "events")
        .groupBy(F.date_trunc("day", "ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    cs = [c for _, c in daily]
    got = {
        r["day"]: (r["win_n"], r["roll_median_x2"])
        for r in QUERIES["rolling_median_daily"](spark, SF_SMALL).collect()
    }
    assert len(got) == len(daily)
    for i, (d, _) in enumerate(daily):
        w = sorted(cs[max(0, i - 6) : i + 1])
        m2 = w[(len(w) - 1) // 2] + w[len(w) // 2]
        assert got[d.strftime("%Y-%m-%d")] == (len(w), m2), d


def test_modal_type_matches_python(spark):
    from py_datalake_move_files_spark.catalog import load_table
    from collections import Counter, defaultdict

    per = defaultdict(Counter)
    for r in (
        load_table(spark, SF_SMALL, "events")
        .select("user_id", "event_type")
        .collect()
    ):
        per[r["user_id"]][r["event_type"]] += 1
    got = {
        r["user_id"]: (
            r["modal_type"],
            r["modal_count"],
            r["n_events"],
            r["modal_share_ppm"],
        )
        for r in QUERIES["modal_event_type_by_user"](
            spark, SF_SMALL
        ).collect()
    }
    assert set(got) == set(per)
    for u, cnt in per.items():
        best = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        n = sum(cnt.values())
        assert got[u] == (
            best[0],
            best[1],
            n,
            best[1] * 1_000_000 // n,
        ), u
