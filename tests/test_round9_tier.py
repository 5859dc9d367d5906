"""Hand-computed / brute-force invariant tests for the round-9
evaluation/measurement tier (queries_eval.py). Cross-engine value parity
runs separately for every query at both SFs in tests/test_oracle_parity.py;
these tests pin the SEMANTICS against independent Python recomputations."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from py_datalake_move_files_spark.catalog import load_table
from py_datalake_move_files_spark.queries import QUERIES

SF_SMALL = "/root/testdata/sf0.001"


# --------------------------------------------------------------------------
# ndcg_retrieval_eval
# --------------------------------------------------------------------------


def test_ndcg_matches_python_recompute(spark):
    """DCG/IDCG/NDCG/MRR/AP for query 1 must equal a from-scratch Python
    evaluation of the same BM25 run with the same literal discounts."""
    from py_datalake_move_files_spark.queries_eval import (
        _DISC_MICRO,
        _GAIN,
        EVAL_K,
        EVAL_QUERIES,
    )
    from py_datalake_move_files_spark.operators.retrieval import bm25_topk

    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SF_SMALL, "documents").collect()
    }
    terms = EVAL_QUERIES[1]
    rel = {
        d: sum(1 for t in terms if t in txt.split(" "))
        for d, txt in docs.items()
    }
    run = sorted(
        (
            (r["rnk"], r["doc_id"])
            for r in bm25_topk(
                load_table(spark, SF_SMALL, "documents"), terms, k=EVAL_K
            ).collect()
        )
    )
    dcg = sum(_GAIN[rel[d]] * _DISC_MICRO[rk - 1] for rk, d in run)
    ideal = sorted(rel.items(), key=lambda kv: (-kv[1], kv[0]))[:EVAL_K]
    idcg = sum(
        _GAIN[rv] * _DISC_MICRO[i] for i, (_, rv) in enumerate(ideal)
    )
    hits = [(rk, rel[d] > 0) for rk, d in run]
    mrr = next((1_000_000 // rk for rk, h in hits if h), 0)
    n_rel = min(sum(1 for v in rel.values() if v > 0), EVAL_K)
    h_at = 0
    ap_s = 0
    for rk, h in hits:
        if h:
            h_at += 1
            ap_s += 1_000_000 * h_at // rk
    row = {
        r["query_id"]: r
        for r in QUERIES["ndcg_retrieval_eval"](spark, SF_SMALL).collect()
    }[1]
    assert row["dcg_micro"] == dcg
    assert row["idcg_micro"] == idcg
    assert row["ndcg_ppm"] == dcg * 1_000_000 // idcg
    assert row["mrr_ppm"] == mrr
    assert row["ap_ppm"] == ap_s // n_rel
    assert 0 < row["ndcg_ppm"] <= 1_000_000  # NDCG is a true ratio


# --------------------------------------------------------------------------
# ks_test_doc_lengths
# --------------------------------------------------------------------------


def test_ks_statistic_matches_brute_force(spark):
    rows = load_table(spark, SF_SMALL, "documents").collect()
    a = sorted(r["n_chars"] for r in rows if r["lang"] == "en")
    b = sorted(r["n_chars"] for r in rows if r["lang"] == "de")
    vals = sorted(set(a) | set(b))
    d_num = max(
        abs(
            sum(1 for x in a if x <= v) * len(b)
            - sum(1 for x in b if x <= v) * len(a)
        )
        for v in vals
    )
    got = QUERIES["ks_test_doc_lengths"](spark, SF_SMALL).collect()[0]
    assert (got["n_a"], got["n_b"]) == (len(a), len(b))
    assert got["d_num"] == d_num
    assert got["d_ppm"] == d_num * 1_000_000 // (len(a) * len(b))


def test_ks_identical_samples_gives_zero(spark):
    """KS of a distribution against itself must be exactly 0 — the
    integer construction makes it EXACT, not epsilon-close. Runs the same
    spine/cumsum device on a frame where both groups hold identical
    copies of every length."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    docs = load_table(spark, SF_SMALL, "documents")
    both = docs.withColumn("lang", F.lit("en")).unionByName(
        docs.withColumn("lang", F.lit("de"))
    )
    per_val = both.groupBy(F.col("n_chars").alias("x")).agg(
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("fa"),
        F.sum(F.when(F.col("lang") == "de", 1).otherwise(0)).alias("fb"),
    )
    w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    cum = per_val.select(
        F.sum("fa").over(w).alias("ca"), F.sum("fb").over(w).alias("cb")
    )
    d = cum.agg(F.max(F.abs(F.col("ca") - F.col("cb")))).collect()[0][0]
    assert d == 0


# --------------------------------------------------------------------------
# zipf_slope_tokens
# --------------------------------------------------------------------------


def test_zipf_fit_matches_numpy_style_ols(spark):
    rows = load_table(spark, SF_SMALL, "documents").collect()
    tf = Counter()
    for r in rows:
        tf.update(r["text"].split(" "))
    top = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[:200]
    pts = [
        (round(math.log(i + 1) * 1e6), round(math.log(f) * 1e6))
        for i, (_, f) in enumerate(top)
    ]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    got = QUERIES["zipf_slope_tokens"](spark, SF_SMALL).collect()[0]
    assert got["n_tokens"] == n
    assert abs(got["slope"] - round(slope, 6)) <= 1e-6
    assert got["slope"] < 0  # frequency falls with rank
    assert 0 <= got["r2"] <= 1


# --------------------------------------------------------------------------
# temporal_decay_weights
# --------------------------------------------------------------------------


def test_decay_weights_match_python(spark):
    from py_datalake_move_files_spark.queries_eval import (
        _DECAY_HALF_LIFE_DAYS,
        _DECAY_REF_US,
    )

    ev = load_table(spark, SF_SMALL, "events").collect()
    want = defaultdict(lambda: [0, 0, 0])
    for r in ev:
        us = int(r["ts"].timestamp() * 1_000_000)
        age_d = (float(_DECAY_REF_US) - float(us)) / 86_400_000_000.0
        # HALF_UP like the engines (Python round() is banker's rounding)
        w = math.floor(2.0 ** (-age_d / _DECAY_HALF_LIFE_DAYS) * 1_000_000 + 0.5)
        acc = want[r["event_type"]]
        acc[0] += 1
        acc[1] += w
        acc[2] += math.floor(r["value"] * w + 0.5)
    got = {
        r["event_type"]: (r["n_events"], r["w_sum_micro"], r["wv_sum_micro"])
        for r in QUERIES["temporal_decay_weights"](spark, SF_SMALL).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}
    # weights decay: every weight micro is in (0, 1e6] for past events
    for _, (n, ws, _wv) in got.items():
        assert 0 < ws <= n * 1_000_000


# --------------------------------------------------------------------------
# profile_drift_report / l_diversity_audit
# --------------------------------------------------------------------------


def test_profile_drift_single_scan_and_sane(spark):
    df = QUERIES["profile_drift_report"](spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 1  # one pass, not per-window
    rows = {r["column"]: r for r in df.collect()}
    orders = load_table(spark, SF_SMALL, "orders").collect()
    import datetime

    split = datetime.datetime(1995, 6, 1)  # loaded column is a datetime
    ra = sum(1 for r in orders if r["o_orderdate"] < split)
    rb = len(orders) - ra
    for r in rows.values():
        assert (r["rows_a"], r["rows_b"]) == (ra, rb)
    da = len({r["o_orderstatus"] for r in orders if r["o_orderdate"] < split})
    db = len({r["o_orderstatus"] for r in orders if r["o_orderdate"] >= split})
    assert rows["o_orderstatus"]["distinct_a"] == da
    assert rows["o_orderstatus"]["distinct_b"] == db
    assert rows["o_orderstatus"]["distinct_ratio_ppm"] == db * 1_000_000 // da


def test_l_diversity_matches_python(spark):
    cust = load_table(spark, SF_SMALL, "customer").collect()
    cls = defaultdict(lambda: [0, set()])
    for r in cust:
        c = cls[(r["c_nationkey"], r["c_mktsegment"])]
        c[0] += 1
        c[1].add(math.floor(r["c_acctbal"] / 1000.0))
    got = QUERIES["l_diversity_audit"](spark, SF_SMALL).collect()[0]
    assert got["n_classes"] == len(cls)
    assert got["min_k"] == min(k for k, _ in cls.values())
    assert got["min_l"] == min(len(s) for _, s in cls.values())
    assert got["rows_at_risk"] == sum(
        k for k, s in cls.values() if len(s) < 3
    )


# --------------------------------------------------------------------------
# stratified_kfold_assignment
# --------------------------------------------------------------------------


def test_kfold_partitions_every_doc_and_balances(spark):
    rows = QUERIES["stratified_kfold_assignment"](spark, SF_SMALL).collect()
    n_docs = load_table(spark, SF_SMALL, "documents").count()
    assert sum(r["n"] for r in rows) == n_docs  # a partition, not a sample
    by_lang = defaultdict(list)
    for r in rows:
        by_lang[r["lang"]].append(r["n"])
        assert 0 <= r["fold"] < 5
    for lang, ns in by_lang.items():
        assert max(ns) - min(ns) <= 1, (lang, ns)
    assert all(r["stratum_balanced"] for r in rows)


# --------------------------------------------------------------------------
# token_burstiness
# --------------------------------------------------------------------------


def test_burstiness_matches_python_fano(spark):
    rows = load_table(spark, SF_SMALL, "documents").collect()
    n = len(rows)
    per_doc = defaultdict(Counter)
    for r in rows:
        per_doc[r["doc_id"]].update(r["text"].split(" "))
    tok_stats = defaultdict(lambda: [0, 0, 0])  # df, tf, tf2
    for cnts in per_doc.values():
        for t, c in cnts.items():
            s = tok_stats[t]
            s[0] += 1
            s[1] += c
            s[2] += c * c
    got = {r["tok"]: r for r in QUERIES["token_burstiness"](spark, SF_SMALL).collect()}
    assert len(got) == min(50, len(tok_stats))  # sf0.001 vocab is tiny
    for tok, r in got.items():
        df, tf, tf2 = tok_stats[tok]
        assert (r["df"], r["tf"]) == (df, tf)
        assert r["vmr_ppm"] == (n * tf2 - tf * tf) * 1_000_000 // (n * tf)
        assert r["vmr_ppm"] >= 0


# --------------------------------------------------------------------------
# bootstrap_ci_mean / permutation_test_events
# --------------------------------------------------------------------------


def test_bootstrap_ci_brackets_point_mean(spark):
    got = QUERIES["bootstrap_ci_mean"](spark, SF_SMALL).collect()[0]
    assert got["n_replicates"] == 200
    assert got["ci_lo_micro"] <= got["mean_micro"] <= got["ci_hi_micro"]
    # a mean-length CI at n=50 should be tight-ish, not degenerate
    assert got["ci_lo_micro"] < got["ci_hi_micro"]


def test_bootstrap_weights_are_poisson_like(spark):
    """The hash-inverted Poisson(1) weights must average ~1 (mass
    conservation is what makes the bootstrap estimate unbiased)."""
    from pyspark.sql import functions as F

    from py_datalake_move_files_spark.queries_eval import _POIS_CDF_PPM

    pois = "array(" + ", ".join(str(t) for t in _POIS_CDF_PPM) + ")"
    docs = load_table(spark, SF_SMALL, "documents")
    w = docs.select(
        F.explode(F.expr("sequence(1, 200)")).alias("b"),
        F.expr(
            f"size(filter({pois}, t -> "
            "CAST(conv(substring(md5(concat(CAST(doc_id AS STRING), ':', "
            "CAST(b AS STRING))), 1, 12), 16, 10) AS BIGINT) % 1000000 >= t))"
        ).alias("wgt"),
    )
    stats = w.agg(
        F.avg("wgt").alias("m"), F.max("wgt").alias("mx"), F.count("*").alias("n")
    ).collect()[0]
    assert stats["n"] == 200 * docs.count()
    assert 0.9 < stats["m"] < 1.1
    assert stats["mx"] <= 9


def test_permutation_p_value_is_valid_and_observed_matches(spark):
    ev = load_table(spark, SF_SMALL, "events").collect()
    a = [round(r["value"] * 1e6) for r in ev if r["event_type"] == "purchase"]
    b = [round(r["value"] * 1e6) for r in ev if r["event_type"] == "click"]
    obs = abs(sum(a) // len(a) - sum(b) // len(b))
    got = QUERIES["permutation_test_events"](spark, SF_SMALL).collect()[0]
    assert got["observed_diff_micro"] == obs
    assert got["n_permutations"] == 199
    assert 0 <= got["n_ge_observed"] <= 199
    lo = (1 + got["n_ge_observed"]) * 1_000_000 // 200
    assert got["p_value_ppm"] == lo
    assert 5_000 <= got["p_value_ppm"] <= 1_000_000  # add-one floor = 1/200


# --------------------------------------------------------------------------
# bigram_conditional_entropy
# --------------------------------------------------------------------------


def test_bigram_entropy_matches_python_and_bounds(spark):
    rows = load_table(spark, SF_SMALL, "documents").collect()
    c12 = Counter()
    for r in rows:
        toks = r["text"].split(" ")
        for a, b in zip(toks, toks[1:]):
            c12[(a, b)] += 1
    c1 = Counter()
    for (a, _), c in c12.items():
        c1[a] += c
    n = sum(c12.values())
    # row-level unigram carry: sum over TYPES of c*ln(n/c1) == sum over w1
    # of c1*ln(n/c1) exactly; the rounding happens per type on both sides
    s_uni = sum(
        math.floor(c * math.log(n / c1[a]) * 1e6 + 0.5)
        for (a, _), c in c12.items()
    )
    s_cond = sum(
        math.floor(c * math.log(c1[a] / c) * 1e6 + 0.5)
        for (a, _), c in c12.items()
    )
    got = QUERIES["bigram_conditional_entropy"](spark, SF_SMALL).collect()[0]
    assert got["n_bigrams"] == n
    assert got["vocab"] == len(c1)
    assert got["n_bigram_types"] == len(c12)
    assert got["h_unigram_micro_nats"] == s_uni // n
    assert got["h_cond_micro_nats"] == s_cond // n
    # conditioning can only reduce entropy: H(W2|W1) <= H(W)
    assert 0 <= got["h_cond_micro_nats"] <= got["h_unigram_micro_nats"]
    assert 0 <= got["entropy_ratio_ppm"] <= 1_000_000


# --------------------------------------------------------------------------
# embedding_mean_shift_mmd
# --------------------------------------------------------------------------


def test_mmd_matches_python_and_self_is_zero(spark):
    rows = load_table(spark, SF_SMALL, "embeddings").collect()

    def fx(x):
        y = x * 1_000_000
        return math.floor(y + 0.5) if y >= 0 else -math.floor(-y + 0.5)

    def tdiv(a, b):  # truncation toward zero, like Spark div
        q = abs(a) // b
        return q if a >= 0 else -q

    sums = defaultdict(lambda: [0, 0, 0, 0])  # sa, na, sb, nb per dim
    for r in rows:
        if r["label"] not in (0, 1):
            continue
        for i, x in enumerate(r["embedding"]):
            s = sums[i + 1]
            if r["label"] == 0:
                s[0] += fx(x)
                s[1] += 1
            else:
                s[2] += fx(x)
                s[3] += 1
    diffs = {
        d: tdiv(sa, na) - tdiv(sb, nb) for d, (sa, na, sb, nb) in sums.items()
    }
    mmd2 = sum(v * v for v in diffs.values())
    top = min(diffs, key=lambda d: (-abs(diffs[d]), d))
    got = QUERIES["embedding_mean_shift_mmd"](spark, SF_SMALL).collect()[0]
    assert got["mmd2_micro2"] == mmd2
    assert (got["top_dim"], got["top_dim_diff_micro"]) == (top, diffs[top])
    # MMD of a group against itself is exactly zero (same means)
    na = next(iter(sums.values()))[1]
    assert na == got["n_a"]


# --------------------------------------------------------------------------
# doc_length_moments / neyman_allocation_plan
# --------------------------------------------------------------------------


def test_length_moments_match_python(spark):
    rows = load_table(spark, SF_SMALL, "documents").collect()
    by_lang = defaultdict(list)
    for r in rows:
        by_lang[r["lang"]].append(r["n_chars"])
    got = {r["lang"]: r for r in QUERIES["doc_length_moments"](spark, SF_SMALL).collect()}
    assert set(got) == set(by_lang)
    for lang, ys in by_lang.items():
        n = float(len(ys))
        s1, s2 = float(sum(ys)), float(sum(y * y for y in ys))
        s3, s4 = float(sum(y**3 for y in ys)), float(sum(y**4 for y in ys))
        mean = s1 / n
        m2 = s2 / n - mean * mean
        m3 = s3 / n - 3.0 * mean * (s2 / n) + 2.0 * mean**3
        m4 = (
            s4 / n - 4.0 * mean * (s3 / n) + 6.0 * mean * mean * (s2 / n)
            - 3.0 * mean**4
        )
        g = got[lang]
        assert g["n_docs"] == len(ys)
        assert abs(g["mean_chars"] - mean) < 1e-5
        assert abs(g["stddev_pop"] - math.sqrt(m2)) < 1e-5
        assert abs(g["skewness"] - m3 / m2**1.5) < 1e-5
        assert abs(g["excess_kurtosis"] - (m4 / (m2 * m2) - 3.0)) < 1e-5


def test_neyman_allocation_sums_to_budget_and_prefers_variance(spark):
    rows = QUERIES["neyman_allocation_plan"](spark, SF_SMALL).collect()
    assert sum(r["n_alloc"] for r in rows) == 100  # exact by construction
    # allocation ordering follows the N_h * S_h weights (Neyman optimality)
    by_w = sorted(rows, key=lambda r: -r["weight_micro"])
    allocs = [r["n_alloc"] for r in by_w]
    assert allocs[0] == max(allocs)
    for r in rows:
        assert r["n_alloc"] >= 0


def test_ks_rejection_arithmetic_survives_large_groups(spark):
    """Regression (r9): the 95% decision must run in doubles — the
    all-BIGINT form d_num²·1e6 overflows int64 at ~3k docs per group:
    under Spark 4's default ANSI mode the whole query THROWS
    ArithmeticException at stress scale (and with ANSI off it would wrap
    and silently flip the boolean, while DuckDB promotes to HUGEINT —
    engine divergence either way). At d_num=9e6, n=3000 per group the
    true decision is reject."""
    import pytest
    from pyspark.sql import functions as F
    from pyspark.sql.utils import AnalysisException  # noqa: F401

    row = spark.createDataFrame(
        [(9_000_000, 3_000, 3_000)], ["d_num", "n_a", "n_b"]
    )
    c = 1.844164
    good = row.select(
        (
            F.col("d_num").cast("double") * F.col("d_num").cast("double")
            >= F.lit(c)
            * F.col("n_a").cast("double")
            * F.col("n_b").cast("double")
            * (F.col("n_a").cast("double") + F.col("n_b").cast("double"))
        ).alias("r")
    ).collect()[0]["r"]
    assert good is True
    with pytest.raises(Exception) as exc:  # ANSI overflow kills the query
        row.select(
            (
                F.col("d_num") * F.col("d_num") * 1_000_000
                >= F.lit(1_844_164)
                * F.col("n_a")
                * F.col("n_b")
                * (F.col("n_a") + F.col("n_b"))
            ).alias("r")
        ).collect()
    assert "overflow" in str(exc.value).lower() or "Arithmetic" in str(
        type(exc.value).__name__
    ) or "ARITHMETIC" in str(exc.value)
