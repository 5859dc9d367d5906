"""Prove the AQE skew-join remedy actually ENGAGES — the session config
enables it (session.py), and the salted-join operators are the explicit
alternative, but until this test nothing demonstrated Spark splitting a
skewed partition at runtime. A 90%-one-key join under lowered skew
thresholds must finalize with ``SortMergeJoin(skew=true)`` and a skewed
``AQEShuffleRead`` — the runtime re-plan that handles moderate skew for
free at 100 TB (salting remains the remedy for extreme single-key skew,
where even split partitions all carry the same key)."""

from __future__ import annotations

from pyspark.sql import functions as F

_AQE_CONF = {
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def test_aqe_splits_skewed_join_partition(spark):
    saved = {}
    for k, v in _AQE_CONF.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        left = spark.range(200_000).select(
            F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id")).alias("k"),
            F.concat(F.lit("payload-" * 16), F.col("id").cast("string")).alias("v"),
        )
        right = spark.range(2_000).select(
            F.col("id").alias("k"), F.col("id").alias("w")
        )
        # tiny aggregate result, but the join subtree executes in full;
        # collect() runs THIS DataFrame's QueryExecution, whose plan we
        # then inspect (a noop write would execute a separate QE)
        out = left.join(right, "k").groupBy().count()
        assert out.collect()[0]["count"] == 180_200
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan
        assert "AQEShuffleRead" in plan and "skewed" in plan, plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
