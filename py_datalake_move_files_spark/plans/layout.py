"""Lake write layout: partitioned parquet sinks with pruning-friendly
physical layout.

The reference writes one blob per file (app/main.py:179-182); an analytics
lake instead lays data out as ``partition_col=value/`` directories so reads
with partition predicates never touch irrelevant files (partition pruning —
visible as ``PartitionFilters`` in the scan). At 100 TB, partition columns
carry the coarse access dimensions (date, source, event type) and
``sortWithinPartitions`` gives min/max row-group statistics for fine-grained
predicate skipping inside each file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    *,
    partition_by: list[str],
    sort_within: list[str] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Write ``df`` hive-partitioned by ``partition_by``; optionally sort
    rows inside each file so parquet row-group min/max stats prune well."""
    out = df
    if sort_within:
        out = df.repartition(*[df[c] for c in partition_by]).sortWithinPartitions(
            *sort_within
        )
    out.write.partitionBy(*partition_by).mode(mode).format(fmt).save(path)


def read_pruned(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Read a partitioned layout; partition-column filters applied by the
    caller prune directories at planning time."""
    return spark.read.format(fmt).load(path)
