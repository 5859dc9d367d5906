"""File-catalog sources (SURVEY.md §2.1 S2/S4/S5/S6).

The reference lists a lake path recursively via the ADLS SDK
(app/main.py:195-216) and fetches per-file properties one RPC at a time
(app/main.py:219-226). Spark's ``binaryFile`` source does both in one
distributed scan: columns ``path, modificationTime, length, content``, with
directories excluded and ``content`` only materialized if referenced (column
pruning — the metadata-only listing never reads file bytes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def list_files(
    spark: SparkSession,
    path: str,
    *,
    glob: str | None = None,
    recursive: bool = True,
) -> DataFrame:
    """S2+S4: recursive file catalog of ``path``.

    Metadata-only projection (``path, length, modificationTime``) — do NOT
    select ``content`` here; Spark prunes the byte reads away entirely.
    """
    reader = spark.read.format("binaryFile").option(
        "recursiveFileLookup", str(recursive).lower()
    )
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path).select("path", "length", "modificationTime")


def read_files_with_content(
    spark: SparkSession,
    path: str,
    *,
    glob: str | None = None,
    recursive: bool = True,
) -> DataFrame:
    """S5: whole-file bytes as a ``content: binary`` column."""
    reader = spark.read.format("binaryFile").option(
        "recursiveFileLookup", str(recursive).lower()
    )
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def read_content_after_metadata_filter(
    spark: SparkSession,
    path: str,
    metadata_pred,
    *,
    glob: str | None = None,
    recursive: bool = True,
) -> DataFrame:
    """Stage 2 of the two-stage content pipeline (SURVEY §4 row 2: "cheap
    metadata date filter before expensive content download",
    reference app/main.py:126-141).

    ``metadata_pred`` must reference only the scan's metadata columns
    (``path``, ``length``, ``modificationTime``). Applying it DIRECTLY to
    the binaryFile scan (not to a derived column) lets Spark push it into
    the source as a data filter; ``BinaryFileFormat`` evaluates pushed
    path/length/modificationTime filters against the file STATUS before
    opening the file, so rejected files never have their bytes read.
    Callers produce date-rejection audit rows from a separate
    :func:`list_files` metadata scan (stage 1), which reads no bytes by
    construction. Verified behaviorally in tests/test_sources.py (an
    over-maxLength file that the predicate rejects does not fail the scan —
    it would throw if its content were materialized) and by plan assertion
    (the FileScan carries the pushed modificationTime filter)."""
    return read_files_with_content(
        spark, path, glob=glob, recursive=recursive
    ).where(metadata_pred)


def with_decoded_text(df: DataFrame, *, content_col: str = "content") -> DataFrame:
    """S6 first half: UTF-8 decode of file bytes (reference app/main.py:61)."""
    return df.withColumn("text", F.decode(F.col(content_col), "UTF-8"))


def read_json_tolerant(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    *,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """S6/P13: schema-on-read JSON with PERMISSIVE error tolerance — rows
    that fail to parse land intact in ``corrupt_col`` instead of failing the
    job (the set-level replacement for the reference's try/except-per-file,
    app/main.py:97-106). Pass an explicit ``schema`` string to avoid the
    inference scan at scale; the corrupt column is appended automatically."""
    reader = (
        spark.read.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
    )
    if schema is not None:
        full = schema.rstrip() + f", {corrupt_col} string"
        reader = reader.schema(full)
    return reader.json(path)
