"""Table catalog: loaders for the harness parquet tables and the reference's
CSV inputs.

The reference loads its manifest with pandas + header inference and a single
required-column assertion (reference app/app.py:72-98). Here every load gets
an explicit StructType so bad files fail fast at the scan, and the tables are
registered in the Spark catalog so both DataFrame and ``spark.sql`` queries
resolve them.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Schema of the reference's archive manifest (reference README.md:72-79,
#: app/quotes/archived_quotes.csv: ``QuoteId;unixtimestamp;filename``).
MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("QuoteId", T.StringType()),
        T.StructField("unixtimestamp", T.LongType()),
        T.StructField("filename", T.StringType()),
    ]
)

#: Schema of the reference's table-catalog CSV (app/quotes/Results.csv).
TABLE_CATALOG_SCHEMA = T.StructType(
    [
        T.StructField("SourceSchema", T.StringType()),
        T.StructField("SourceTableName", T.StringType()),
        T.StructField("Source", T.StringType()),
    ]
)


def default_sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_snapshot(sf_dir: str, name: str) -> tuple:
    """Cache-key fingerprint of a table: (path, mtime_ns, size) for a local
    parquet file, path-only when the stat isn't available (remote storage,
    missing file). Process-lifetime caches of anything DERIVED from a table
    (IVF centroids, PQ codebooks) must key on this instead of the bare
    sf_dir, so rewriting data under the same path invalidates them
    (ADVICE r4: a bare-path key silently served stale trained state)."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        st = os.stat(path)
        return (path, st.st_mtime_ns, st.st_size)
    except OSError:
        return (path,)


def _normalize_timestamps(df: DataFrame) -> DataFrame:
    """Cast any TIMESTAMP_NTZ column to TimestampType.

    The harness parquet has shipped ``events.ts`` as TIMESTAMP(NANOS) and as
    tz-less TIMESTAMP(MICROS) in different rounds; sessions this engine did
    not create may also read the latter as TIMESTAMP_NTZ (Spark's default
    ``parquet.inferTimestampNTZ``). The reference compares plain tz-naive
    datetimes (reference app/main.py:120-132), so with the session timezone
    pinned to UTC (session.py) the NTZ -> UTC TimestampType cast is
    semantics-preserving and keeps every downstream unix_millis / watermark /
    range-frame expression working on one timestamp flavor.
    """
    from pyspark.sql import functions as F

    ntz_cols = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    if ntz_cols:
        df = df.withColumns(
            {c: F.col(c).cast(T.TimestampType()) for c in ntz_cols}
        )
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one harness table. Plain parquet scan — predicate pushdown and
    column pruning happen in the reader, so callers should filter/select on
    this DataFrame directly rather than caching wide copies.

    ``events.ts`` has shipped as parquet TIMESTAMP(NANOS) — which Spark's
    vectorized reader rejects, so we read it as nano-long (``nanosAsLong``)
    and floor-truncate to microseconds, exactly what DuckDB/Arrow do — and
    as tz-less TIMESTAMP(MICROS), normalized by :func:`_normalize_timestamps`.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return _normalize_timestamps(df)
    return _normalize_timestamps(spark.read.parquet(path))


def register_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every harness table as a temp view; return them by name."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def read_manifest_csv(
    spark: SparkSession,
    path: str,
    *,
    schema: T.StructType = MANIFEST_SCHEMA,
    required_cols: tuple[str, ...] = ("filename",),
) -> DataFrame:
    """Read a ``;``-delimited manifest CSV with a fixed schema (operator S1).

    Replaces the reference's pandas read + required-column check
    (app/app.py:80-89). A fixed schema reads by POSITION, so the header is
    validated by name first — a manifest missing ``filename`` fails fast
    with the available columns listed (the reference's P3 assertion,
    app/app.py:83-86) instead of silently loading misaligned data.
    """
    if required_cols:
        header = (
            spark.read.option("header", True).option("sep", ";").csv(path).columns
        )
        missing = [c for c in required_cols if c not in header]
        if missing:
            raise ValueError(
                f"manifest {path} is missing required column(s) {missing}; "
                f"available: {header}"
            )
    return (
        spark.read.option("header", True)
        .option("sep", ";")
        .schema(schema)
        .csv(path)
    )
