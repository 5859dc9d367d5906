"""SparkSession factory.

Defaults are chosen for the 100 TB design target, then scaled down by env
vars for local runs:

- AQE on (runtime re-plan: partition coalescing, skew-join splitting,
  dynamic broadcast) — replaces the reference's hand-tuned MAX_WORKERS /
  BATCH_SIZE knobs (reference app/app.py:33,174; app/main.py:29,278).
- Arrow on, so any unavoidable Pandas UDF moves data in vectorized batches.
- ``spark.sql.shuffle.partitions`` sized from SPARK_GRAFT_CPUS locally; on a
  real cluster AQE coalesces from a deliberately high initial number.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "py-datalake-move-files-spark",
    *,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Cloud credentials (the reference's env-config, app/config.py:15-20) would
    map onto ``spark.hadoop.fs.azure.account.oauth2.*`` here; in this repo we
    run against local parquet, so only compute/shuffle conf is set.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(cpus))
        )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # respect parallelism when coalescing post-shuffle partitions
        # (Spark's default): expansion-heavy stages (inverted-index self-
        # joins, candidate verification) are CPU-bound with small shuffle
        # BYTES, and size-first coalescing collapsed them to ~1 partition —
        # serializing exactly the stages that need every core (measured 2.3×
        # on connected components). At 100 TB shuffle sizes dwarf the 64 MB
        # advisory, so both policies produce thousands of partitions there —
        # this knob only changes the small-shuffle/CPU-heavy regime.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # keep observability nodes alive under AQE: the cap device
        # (operators/similarity._cap_bucket_size) anti-joins a usually-
        # EMPTY broadcast of over-cap bucket keys, and
        # AQEPropagateEmptyRelation would eliminate that subtree together
        # with its CollectMetrics node — corrupting Observation reads and
        # silencing the no-silent-caps metric exactly in the clean case.
        # Empty-relation propagation is a shortcut for runtime-empty
        # intermediates only; on non-degenerate lakes it never fires, so
        # excluding it costs nothing while making the metrics contract
        # unconditional.
        .config(
            "spark.sql.adaptive.optimizer.excludedRules",
            "org.apache.spark.sql.execution.adaptive.AQEPropagateEmptyRelation",
        )
        # reliable-checkpoint GC: iterative operators (connected components,
        # pagerank) checkpoint per round; the ContextCleaner deletes a
        # round's files once its RDD is unreferenced, bounding checkpoint
        # storage at O(live rounds) instead of O(all rounds)
        .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # tz-less parquet timestamps (timestamp[us] with isAdjustedToUTC=false)
        # read as TimestampType, not TIMESTAMP_NTZ. The reference compares
        # plain tz-naive datetimes (app/main.py:120-132); with the session
        # pinned to UTC above, NTZ -> UTC-instant is semantics-preserving, and
        # it keeps unix_millis/watermarks/window ranges working uniformly
        # across batch and readStream.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # local mode: the driver JVM IS the executor — at 8g the bench's
        # accumulated shuffle/broadcast state pushed GC into the measured
        # queries (1.7× total slowdown observed); real clusters size
        # spark.executor.memory instead and ignore this knob
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
