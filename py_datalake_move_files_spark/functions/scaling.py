"""Parallelism guards.

A small parquet file arrives as ONE input partition (parquet can't split a
single row group), so CPU-heavy per-row operators (shingling, hashing,
vector math) would run on one core no matter how many are available. At
100 TB the scan naturally yields thousands of partitions and these helpers
are no-ops; locally they round-robin the rows out once, before the heavy
compute, which costs one small shuffle and buys full CPU utilization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Repartition ``df`` up to the session's default parallelism iff it has
    fewer partitions than half of that — i.e. only when the input is too
    concentrated to use the cluster. Never coalesces.

    Streaming DataFrames pass through untouched: ``df.rdd`` is illegal on
    a stream (analysis error), micro-batch partitioning is the source's
    concern, and the guard exists only for the tiny-local-file case — so
    every map-only operator that calls this stays stream-compatible."""
    if df.isStreaming:
        return df
    sc = df.sparkSession.sparkContext
    target = min_parts or sc.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target)
    return df
