"""Bucketed-table writes: pre-shuffled storage for co-located joins.

The 100 TB story: a fact⋈fact join (orders⋈lineitem, events⋈events)
shuffles BOTH sides on the key every time it runs. Writing the tables
bucketed (and sorted) by that key pays the shuffle ONCE at ingest; every
subsequent join of two tables bucketed into the same bucket count on the
same key plans with ZERO Exchange — each task zips bucket i with bucket i
(and with sortBy, no Sort either: a pure streaming merge). This is the
storage-layout half of shuffle avoidance, complementing the plan-side
halves (broadcast for small dims, AQE for skew) used across the repo.

Pinned by tests/test_bucketed_join.py: the joined plan contains a
SortMergeJoin and NO Exchange on either side.

Reference parity note: the reference utility has no storage layer at all
(it moves files one by one, app/main.py:149-192); bucketing is the Spark
native answer to "make the next job's join free", the same ends as its
prefix-partitioned folder layout serves for listing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    key: str,
    buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (optionally bucket-sorted) managed
    parquet table. ``buckets`` should be sized so one bucket of the LARGER
    table fits an executor core's working set (at 100 TB that is
    thousands; both join sides must use the same count for bucket-wise
    zipping)."""
    w = df.write.mode(mode).format("parquet").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a managed table back with its bucketing metadata intact (a
    plain parquet path read would lose it — the catalog carries the
    bucket spec, so joins must go through ``spark.table``)."""
    return spark.table(table)
