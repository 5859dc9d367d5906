"""Property-based tests for the round-7 mining devices: randomized
inputs checked against plain-Python recomputations. The contracts that
can silently break under refactoring are the tie handling in the
Mann-Whitney AUC rank-sum and the lower/upper read of the weighted
median under arbitrary weight mixes (even/odd totals, all-ties, single
groups)."""

from __future__ import annotations

import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from py_datalake_move_files_spark.queries import QUERIES

cents = st.integers(min_value=0, max_value=6)  # tiny domain → many ties


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    pos=st.lists(cents, min_size=1, max_size=8),
    neg=st.lists(cents, min_size=1, max_size=8),
)
def test_auc_rank_sum_equals_pairwise(spark, pos, neg):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, t0, "purchase", v / 100.0) for i, v in enumerate(pos)
    ] + [(100 + i, t0, "view", v / 100.0) for i, v in enumerate(neg)]
    num2 = 0  # 2x the pairwise win count (ties count 1)
    for p in pos:
        for n in neg:
            num2 += 2 if p > n else (1 if p == n else 0)
    want = num2 * 1_000_000 // (2 * len(pos) * len(neg))
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows,
            "user_id long, ts timestamp, event_type string, value double",
        ).write.mode("overwrite").parquet(f"{d}/events.parquet")
        r = QUERIES["value_purchase_auc"](spark, d).collect()[0]
    assert r["auc_ppm"] == want
    assert r["gini_ppm"] == 2 * want - 1_000_000


wrow = st.tuples(
    st.integers(min_value=1, max_value=5),  # price cents
    st.integers(min_value=1, max_value=9),  # integer weight
    st.sampled_from(["A", "B"]),
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(rows=st.lists(wrow, min_size=1, max_size=10))
def test_weighted_median_matches_sorted_walk(spark, rows):
    data = [
        (i, c / 100.0, float(w), flag)
        for i, (c, w, flag) in enumerate(rows)
    ]
    per: dict = {}
    for _, price, w, flag in data:
        per.setdefault(flag, []).append((round(price * 100), int(w)))
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
        want[flag] = (tot, lower + upper)
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            data,
            "l_orderkey long, l_extendedprice double, l_quantity double,"
            " l_returnflag string",
        ).write.mode("overwrite").parquet(f"{d}/lineitem.parquet")
        got = {
            r["l_returnflag"]: (r["total_weight"], r["wmedian_cents_x2"])
            for r in QUERIES["weighted_median_price"](spark, d).collect()
        }
    assert got == want
