"""Properties of the round-6 stats tier (queries_stats.py) beyond the
two-scale oracle parity: internal consistency of the Fellegi–Sunter
scorer, the seasonal/Benford integer accounting, Theil–Sen pair counts,
and the exactness of gram_moments against a brute-force Python mirror.
"""

from __future__ import annotations

import math

import pytest

from py_datalake_move_files_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_gram_moments_matches_bruteforce(spark):
    from py_datalake_move_files_spark.operators.similarity import gram_moments

    vecs = [
        [0.5, -0.25, 0.1250004],
        [1.0, 0.0000005, -0.0000005],  # half-way ties: away from zero
        [-0.75, 0.333333, 0.6666667],
        [0.1, 0.2, -0.3],
        [0.0, -1.0, 1.0],
    ]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<float>"
    ).repartition(3)
    n, s, g = gram_moments(df, "embedding", dim=3, scale=1_000_000)

    def enc(x):
        import struct

        # float32 storage widened exactly to float64, then half-away round
        x32 = struct.unpack("f", struct.pack("f", x))[0]
        y = x32 * 1_000_000.0
        return int(math.copysign(math.floor(abs(y) + 0.5), y))

    enc_vecs = [[enc(x) for x in v] for v in vecs]
    assert n == 5
    for i in range(3):
        assert s[i] == sum(v[i] for v in enc_vecs)
        for j in range(i, 3):
            assert g[(i, j)] == sum(v[i] * v[j] for v in enc_vecs)


def test_pca_top_component_properties(spark):
    rows = QUERIES["pca_top_component"](spark, SF).collect()
    assert len(rows) == 64
    ss = sum(r["loading"] ** 2 for r in rows)
    assert abs(ss - 1.0) < 1e-3  # unit eigenvector (6-dp rounded parts)
    ppm = {r["explained_ppm"] for r in rows}
    assert len(ppm) == 1 and 0 < ppm.pop() <= 1_000_000
    ev = {r["eigenvalue"] for r in rows}
    assert len(ev) == 1 and ev.pop() > 0


def test_record_linkage_decisions_consistent(spark):
    from py_datalake_move_files_spark.queries_stats import (
        _T_MATCH,
        _T_POSSIBLE,
    )

    rows = QUERIES["record_linkage_scores"](spark, SF).collect()
    assert rows, "blocking produced no candidates at sf0.001"
    seen = set()
    for r in rows:
        assert r["custkey_a"] < r["custkey_b"]
        assert (r["custkey_a"], r["custkey_b"]) not in seen
        seen.add((r["custkey_a"], r["custkey_b"]))
        assert 0 <= r["hdist"] <= 2
        want = (
            "match"
            if r["score_micro"] >= _T_MATCH
            else "possible"
            if r["score_micro"] >= _T_POSSIBLE
            else "non_match"
        )
        assert r["decision"] == want


def test_seasonal_decomposition_accounting(spark):
    rows = QUERIES["seasonal_daily_decomposition"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 1 <= r["iso_dow"] <= 7
        assert r["seasonal_ppm"] > 0
    # every (type, day) contributes exactly one ratio row
    import duckdb

    nd = duckdb.connect().execute(
        f"SELECT count(*) FROM (SELECT DISTINCT event_type,"
        f" date_trunc('day', ts) FROM read_parquet('{SF}/events.parquet'))"
    ).fetchone()[0]
    assert sum(r["n_days"] for r in rows) == nd


def test_theil_sen_pair_counts(spark):
    rows = QUERIES["theil_sen_revenue_trend"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r["n_pairs"] == r["n_months"] * (r["n_months"] - 1) // 2


def test_benford_shares_account(spark):
    rows = QUERIES["benford_order_values"](spark, SF).collect()
    assert 1 <= len(rows) <= 9
    assert all(1 <= r["first_digit"] <= 9 for r in rows)
    total_ppm = sum(r["share_ppm"] for r in rows)
    # integer DIV floors each share, so the sum can undershoot slightly
    assert 1_000_000 - len(rows) <= total_ppm <= 1_000_000


def test_dim_label_mutual_info_bounds(spark):
    rows = QUERIES["dim_label_mutual_info"](spark, SF).collect()
    assert len(rows) == 64
    # MI is non-negative up to micro-rounding, and bounded by H(bin) <= ln 2
    for r in rows:
        assert -100 <= r["mi_micro_nats"] <= int(math.log(2) * 1e6) + 100


@pytest.mark.parametrize("name", ["knn_graph_edges", "dedup_cluster_assignment"])
def test_artifact_cache_serves_identical_frame(spark, name):
    """Second invocation under the same layout serves the SAME checkpointed
    plan (no rebuild), and the artifact cache keys on the shuffle setting
    (a different layout gets its own build — what keeps
    test_partition_invariance meaningful)."""
    from py_datalake_move_files_spark.functions import artifacts

    a = QUERIES[name](spark, SF)
    b = QUERIES[name](spark, SF)
    assert a.sameSemantics(b)
    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key)
    try:
        spark.conf.set(key, str(int(prev) + 1))
        c = QUERIES[name](spark, SF)
        assert not a.sameSemantics(c)
    finally:
        spark.conf.set(key, prev)
    assert len(artifacts._ARTIFACTS) >= 2


def test_kaplan_meier_monotone_and_accounted(spark):
    rows = sorted(
        QUERIES["kaplan_meier_retention"](spark, SF).collect(),
        key=lambda r: r["duration_days"],
    )
    assert rows
    # survival is non-increasing in duration, within [0, 1]
    last = 1.0
    for r in rows:
        assert 0.0 <= r["survival"] <= last + 1e-9
        last = r["survival"]
    # at-risk accounting: n_risk drops by exactly the prior row's exits
    for a, b in zip(rows, rows[1:]):
        assert b["n_risk"] == a["n_risk"] - a["n_churned"] - a["n_censored"]


def test_cusum_telescopes_to_zero(spark):
    rows = QUERIES["daily_count_cusum"](spark, SF).collect()
    assert rows
    # the final cumulative deviation telescopes to exactly zero
    final = max(rows, key=lambda r: r["day"])
    assert final["cusum_scaled"] == 0
    assert sum(1 for r in rows if r["is_changepoint"]) >= 1
