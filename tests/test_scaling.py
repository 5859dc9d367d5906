"""ensure_parallelism guard: conf-based scan estimate, no df.rdd probe
(VERDICT r4 #4 — the RDD conversion forced full physical planning on every
query build)."""

from __future__ import annotations

from pyspark.sql import functions as F

from py_datalake_move_files_spark.catalog import load_table
from py_datalake_move_files_spark.functions.scaling import (
    _conf_bytes,
    _estimated_scan_partitions,
    ensure_parallelism,
)

SF = "/root/testdata/sf0.01"


def test_conf_bytes_parses_spark_size_forms():
    assert _conf_bytes("134217728") == 134217728
    assert _conf_bytes("134217728b") == 134217728
    assert _conf_bytes("128m") == 128 << 20
    assert _conf_bytes("1g") == 1 << 30
    assert _conf_bytes(" 4K ") == 4096


def test_small_local_scan_is_widened(spark):
    docs = load_table(spark, SF, "documents")
    est = _estimated_scan_partitions(docs)
    assert est is not None and est >= 1
    target = spark.sparkContext.defaultParallelism
    widened = ensure_parallelism(docs)
    if est < max(2, target // 2):
        assert widened.rdd.getNumPartitions() == target  # test-only probe
    assert widened.count() == docs.count()


def test_in_memory_frame_passes_through_unchanged(spark):
    df = spark.range(10).withColumn("x", F.col("id") * 2)
    assert _estimated_scan_partitions(df) is None
    assert ensure_parallelism(df) is df


def test_guard_never_builds_an_rdd(spark, monkeypatch):
    """The whole point of the rework: the guard must not touch df.rdd."""
    from pyspark.sql import DataFrame

    docs = load_table(spark, SF, "documents")

    def boom(self):
        raise AssertionError("ensure_parallelism touched df.rdd")

    monkeypatch.setattr(DataFrame, "rdd", property(boom))
    ensure_parallelism(docs)  # must not raise


def test_derived_query_still_estimable(spark):
    # filters/projections keep the same input files — the estimate (and
    # therefore the guard decision) survives operator composition
    docs = load_table(spark, SF, "documents").where(F.col("doc_id") < 100)
    assert _estimated_scan_partitions(docs) is not None
