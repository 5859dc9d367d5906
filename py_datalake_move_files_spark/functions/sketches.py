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
invariant pinned in tests/test_sketches.py. No DuckDB oracle exists (DuckDB's
``approx_count_distinct`` is a different sketch), so this tier is
pytest-verified rather than registry-checked, like the streaming surface.

No analogue in the reference (a 565-LoC file mover, app/main.py); part of
the engine's analytics mandate (BASELINE.json north star).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
