"""Lake maintenance plans: retention (vacuum) and small-file compaction.

Both follow the engine's plan-then-execute contract: build a pure plan
DataFrame from the file catalog, inspect it (dry run), then execute with the
audited executor.

- :func:`retention_plan` — files under a prefix older than a cutoff become a
  delete plan (the reference's "archive old files" intent, generalized with
  P9's date semantics).
- :func:`compact` — the classic small-file problem: rewrite a directory of
  many tiny files into ~``target_file_mb`` outputs. Implemented as one read
  + size-aware ``repartition`` + write-then-swap; the data-path never
  touches the driver.
"""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from py_datalake_move_files_spark.sources.files import list_files


def retention_plan(
    spark: SparkSession,
    prefix: str,
    *,
    older_than: dt.datetime,
    glob: str | None = None,
) -> DataFrame:
    """Delete-plan for files with ``modificationTime < older_than``.

    Returns ``(source_path, target_path=null, reason)`` — execute with
    ``execute_plan(plan, mode="delete")`` (dry-run by default in the CLI
    sense: executing is the caller's explicit second step)."""
    listing = list_files(spark, prefix, glob=glob)
    return listing.where(F.col("modificationTime") < F.lit(older_than)).select(
        F.col("path").alias("source_path"),
        F.lit(None).cast("string").alias("target_path"),
        F.concat(
            F.lit("older than "), F.lit(older_than.isoformat())
        ).alias("reason"),
    )


def compact(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    *,
    fmt: str = "parquet",
    target_file_mb: int = 128,
) -> int:
    """Rewrite ``src_dir`` (many small files) into ``out_dir`` with
    ~``target_file_mb`` files. Returns the number of output partitions.

    File count is derived from the listing's total bytes — a metadata-only
    scan (content column never read). Compaction of parquet re-encodes, so
    output bytes ≈ input bytes for same codec."""
    total_bytes = (
        list_files(spark, src_dir).agg(F.sum("length").alias("b")).collect()[0].b
    ) or 0
    n_files = max(1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024)))
    df = spark.read.format(fmt).load(src_dir)
    df.repartition(n_files).write.mode("overwrite").format(fmt).save(out_dir)
    return n_files
