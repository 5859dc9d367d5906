"""Property-based tests (hypothesis) for the round-5 exact-reduction
devices: the histogram-rank median (mad_outlier_events' core) and the
aggregate-then-window skyline (pareto_quality_frontier's core).

Both devices replace scale-killing plans (value-buffering percentiles, a
quadratic dominance join / corpus-sized global window) with bounded
aggregates — these properties pin that the reductions are EXACT on
arbitrary inputs, not just on the harness tables."""

from __future__ import annotations

import statistics

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

values = st.lists(st.integers(min_value=-500, max_value=500), min_size=1, max_size=40)
points = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=20), st.integers(min_value=0, max_value=20)
    ),
    min_size=1,
    max_size=30,
)


def _median_x2_from_histogram(spark, vals: list[int]) -> int:
    """The exact device from queries_analytics.q_mad_outlier_events, run on
    one anonymous group."""
    df = spark.createDataFrame([(v,) for v in vals], "c long").withColumn(
        "g", F.lit("x")
    )
    hist = df.groupBy("g", "c").agg(F.count(F.lit(1)).alias("n"))
    wcum = (
        Window.partitionBy("g")
        .orderBy("c")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("g")
    c = hist.withColumn("cw", F.sum("n").over(wcum)).withColumn(
        "tot", F.sum("n").over(wtot)
    )
    lo = F.min(F.when(F.expr("cw >= (tot + 1) div 2"), F.col("c")))
    hi = F.min(F.when(F.expr("cw >= (tot + 2) div 2"), F.col("c")))
    return c.groupBy("g").agg((lo + hi).alias("m2")).collect()[0].m2


@settings(
    max_examples=20, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(values)
def test_histogram_median_matches_statistics_median(spark, vals):
    got = _median_x2_from_histogram(spark, vals)
    assert got == round(2 * statistics.median(vals))


@settings(
    max_examples=20, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(points)
def test_aggregate_skyline_equals_bruteforce_pareto(spark, pts):
    """per-x max -> desc running max over the aggregate == the brute-force
    strict-dominance frontier on the deduplicated point set."""
    df = spark.createDataFrame(pts, "x int, y int")
    per_x = df.groupBy("x").agg(F.max("y").alias("y_max"))
    w = Window.orderBy(F.col("x").desc()).rangeBetween(
        Window.unboundedPreceding, -1
    )
    got = {
        (r.x, r.y_max)
        for r in per_x.withColumn("m", F.max("y_max").over(w))
        .where(F.col("m").isNull() | (F.col("y_max") > F.col("m")))
        .collect()
    }
    uniq = set(pts)
    brute = {
        (x, y)
        for (x, y) in uniq
        if not any(
            (a >= x and b >= y and (a > x or b > y)) for (a, b) in uniq
        )
    }
    assert got == brute


@settings(
    max_examples=20, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(values)
def test_histogram_quartiles_match_statistics_inclusive(spark, vals):
    """The x4 fixed-point histogram-rank quantile device (the
    conversion-latency query's core) must equal Python's inclusive (R-7)
    quantiles on arbitrary integer multisets."""
    import statistics

    df = spark.createDataFrame([(v,) for v in vals], "c long")
    hist = df.groupBy("c").agg(F.count(F.lit(1)).alias("n"))
    wcum = Window.orderBy("c").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.withColumn("cw", F.sum("n").over(wcum)).withColumn(
        "tot", F.sum("n").over(Window.partitionBy())
    )
    aggs = []
    for k in (1, 2, 3):
        lo = f"(((tot - 1) * {k}) div 4 + 1)"
        fr = f"(((tot - 1) * {k}) % 4)"
        vlo = f"min(CASE WHEN cw >= {lo} THEN c END)"
        vhi = f"min(CASE WHEN cw >= {lo} + 1 THEN c END)"
        aggs.append(
            F.expr(
                f"CAST(CASE WHEN max({fr}) = 0 THEN 4 * {vlo} "
                f"ELSE 4 * {vlo} + max({fr}) * ({vhi} - {vlo}) END AS BIGINT)"
            ).alias(f"q{k}")
        )
    row = cum.agg(*aggs).collect()[0]
    if len(vals) >= 2:
        want = statistics.quantiles(vals, n=4, method="inclusive")
        for k in (1, 2, 3):
            assert row[f"q{k}"] == round(4 * want[k - 1]), (vals, k)
    else:
        # single value: every quartile is that value
        for k in (1, 2, 3):
            assert row[f"q{k}"] == 4 * vals[0]
