"""Mergeable-sketch materialization: HyperLogLog partials per grain, unioned
at query time.

THE 100 TB rollup pattern for distinct counts: ``COUNT(DISTINCT user)`` over
a quarter cannot be derived from daily exact counts (distincts don't add),
so either every query re-shuffles the quarter's raw keys — or the pipeline
materializes a DAILY HLL SKETCH (KBs per grain, computed with map-side
combine in one pass) and every window/rollup query afterwards is a cheap
``hll_union_agg`` over a few hundred sketch rows. Spark ships the Apache
DataSketches HLL family as SQL aggregates (``hll_sketch_agg`` /
``hll_union_agg`` / ``hll_sketch_estimate``), all JVM-side.

The estimates are deterministic for a given item set (the sketch hashes
values, not partition layouts) and the union is associative/commutative, so
``estimate(union(daily)) == estimate(sketch(whole corpus))`` EXACTLY — the
invariant pinned in tests/test_sketches.py. For the HLL tier no DuckDB
oracle exists (DuckDB's ``approx_count_distinct`` is a different sketch),
so it is pytest-verified rather than registry-checked, like the streaming
surface. The count-min tier below IS oracle-checked
(``cms_token_frequencies``): its cells are plain md5-bucket counts.

No analogue in the reference (a 565-LoC file mover, app/main.py); part of
the engine's analytics mandate (BASELINE.json north star).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cms_hash_sql(j_sql: str, item_sql: str, width: int) -> str:
    """Row-``j`` count-min bucket for a string item: first 8 md5 hex chars →
    BIGINT → mod width (the hex→int Spark/DuckDB parity pair). ``j_sql`` and
    ``item_sql`` are SQL string expressions."""
    return (
        f"CAST(conv(substring(md5(concat(CAST({j_sql} AS STRING), ':', "
        f"{item_sql})), 1, 8), 16, 10) AS BIGINT) % {width}"
    )


def cms_cells(
    items: DataFrame,
    item_col: str,
    *,
    depth: int = 4,
    width: int = 1024,
    grain_cols: Sequence[str] = (),
) -> DataFrame:
    """Count-min sketch as a DataFrame: ``(grain…, row_j, bucket, n)`` —
    at most ``depth·width`` cells per grain regardless of item cardinality.

    The CMS is LINEAR (cells of A∪B = elementwise sum of cells of A and
    cells of B — pinned in tests/test_sketches.py), which makes it the
    frequency analogue of the HLL partials above: materialize per-day cell
    tables once, answer any-window frequency estimates later by summing a
    few thousand cell rows instead of re-shuffling the raw token stream.
    Point estimate = min over the ``depth`` row buckets; always ≥ the true
    count (hashing collisions only ADD).

    Plan shape: the items are exploded ×depth map-side, but partial
    aggregation collapses each partition to ≤ depth·width rows before the
    ONE shuffle — at 100 TB the exchange moves bounded sketch cells, never
    the token stream. Everything is md5-bucket column math (exact DuckDB
    twin via :func:`cms_hash_sql`)."""
    rows = items.select(
        *grain_cols,
        F.col(item_col).cast("string").alias("__item"),
        F.explode(F.expr(f"sequence(0, {depth - 1})")).alias("row_j"),
    )
    return (
        rows.select(
            *grain_cols,
            "row_j",
            F.expr(cms_hash_sql("row_j", "__item", width)).alias("bucket"),
        )
        .groupBy(*grain_cols, "row_j", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def cms_estimate(
    cells: DataFrame,
    probes: DataFrame,
    item_col: str,
    *,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-estimate frequencies for a (small) probe set against a CMS
    cell table: each probe joins its ``depth`` buckets and takes the min.
    The cell table is ≤ depth·width rows and broadcast; probe estimation
    never touches the original item stream."""
    pj = probes.withColumn(
        "row_j", F.explode(F.expr(f"sequence(0, {depth - 1})"))
    ).withColumn(
        "bucket",
        F.expr(cms_hash_sql("row_j", f"CAST({item_col} AS STRING)", width)),
    )
    keep = [c for c in probes.columns]
    return (
        pj.join(F.broadcast(cells), ["row_j", "bucket"])
        .groupBy(*keep)
        .agg(F.min("n").cast("long").alias("cms_est"))
    )


def sketch_partials(
    df: DataFrame,
    item_col: str,
    grain_cols: Sequence[str],
    *,
    lg_k: int = 12,
    out: str = "hll_sketch",
) -> DataFrame:
    """One HLL sketch (binary, ~2^lg_k bytes max) + exact row count per
    grain. ONE shuffle keyed on the grain, partial sketches merged
    map-side — this is the expensive pass, run once per data drop and
    written next to the data as the distinct-count 'index'."""
    return df.groupBy(*grain_cols).agg(
        F.hll_sketch_agg(F.col(item_col), F.lit(lg_k)).alias(out),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )


def union_estimate(
    partials: DataFrame,
    group_cols: Sequence[str] = (),
    *,
    sketch_col: str = "hll_sketch",
    out: str = "approx_distinct",
) -> DataFrame:
    """Roll sketch partials up to ``group_cols`` (empty = grand total):
    ``hll_union_agg`` over sketch rows, never the raw items. A quarter's
    distinct users from daily partials touches ~90 KB-sized rows instead
    of re-shuffling the quarter's raw keys."""
    grouped = (
        partials.groupBy(*group_cols) if group_cols else partials.groupBy()
    )
    return grouped.agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col(sketch_col)))
        .cast("long")
        .alias(out),
        F.sum("n_rows").cast("long").alias("n_rows"),
    )
