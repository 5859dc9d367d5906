"""Named query registry — the driver contract (SURVEY.md §2 coverage).

Each entry pairs a Spark DataFrame callable ``(spark, sf_dir) -> DataFrame``
with an equivalent ANSI-SQL oracle string for DuckDB over the same parquet
tables. The driver hash-compares them (row count + schema + order-insensitive
value hash), so every computed column is aliased identically on both sides
and floating-point is handled by one of three portability rules:

1. money/2-decimal columns aggregate via exact ``decimal(18,2)`` (or
   ``decimal(9,2)`` products) and only then cast to double + round(2);
   when the exact sum can land on a half-cent boundary (scale>2 products,
   e.g. price*(1-disc)), round IN THE DECIMAL DOMAIN first and cast the
   rounded decimal to double (``F.round(sum_dec, 2).cast("double")`` vs
   ``CAST(round(sum_dec, 2) AS DOUBLE)``) — rounding after the double cast
   diverges on ties because the engines round different representations
   (Spark the shortest decimal repr, DuckDB the binary double; found on
   q7_bilateral_volume, 3/2095 groups off by one cent);
2. ratios/divisions are computed with the SAME operation order in both
   engines (IEEE doubles are deterministic given identical op order) and
   rounded to 6 dp;
3. vector math uses explicit left-associative arithmetic chains generated
   by the helpers below — bit-identical in any engine.

File-pipeline operators (manifest semi-join, path rewrite — the reference's
pipelines, app/app.py + app/main.py) are exercised on a file catalog DERIVED
from the ``documents`` table so the oracle can check them in pure SQL; the
same operators run against real directories in tests/ and plans/movecopy.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from py_datalake_move_files_spark.catalog import load_table
from py_datalake_move_files_spark.operators import dedup as D
from py_datalake_move_files_spark.operators import similarity as SIM
from py_datalake_move_files_spark.operators import text as TXT
from py_datalake_move_files_spark.operators.asof import asof_join, range_join
from py_datalake_move_files_spark.operators.manifest import build_archive_plan
from py_datalake_move_files_spark.operators.paths import (
    basename,
    parent_dir,
    prefix_qualify,
    rewrite_prefix,
)
from py_datalake_move_files_spark.operators.predicates import (
    date_range_predicate,
    json_key_probe_fast,
    make_json_key_probe_exact,
    reason_cascade,
)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}

from py_datalake_move_files_spark.oracle_frags import (  # noqa: F401 — re-export
    EMB_DIM,
    dd_cosine,
    dd_dot,
    dd_norm,
)

N_PLANES = 8
MINHASHES = 8
BANDS = 4
JACCARD_T = 0.5
NEAR_DUP_T = 0.30

#: Scale caps for the quadratic pair-generation stages (VERDICT r11 #1;
#: mirrored in every oracle that nests the capped fragments, exactly as
#: semantic_dedup_summary's cap is). Values chosen from measured bucket
#: distributions on the harness + stress lakes so the guards are inert at
#: the parity scales and bind where the quadratic blows up:
#:
#: - DF_CAP: shingle document-frequency cap for exact-Jaccard candidate
#:   DISCOVERY (the stop-shingle drop; discovered pairs still verify over
#:   FULL shingle sets, so emitted Jaccard values are exact). Max observed
#:   df: 7 (sf0.01), 25 (sf0.1), 151 (stress sf1), 929 (stress sf10);
#:   posting-pair mass Σdf² grows 41.7× for 10× data uncapped vs 3.6× at
#:   128 — the sf10 scale-killer the round-11 sweep measured.
#: - LSH_BUCKET_CAP: MinHash band-bucket cap (lsh_candidate_pairs
#:   max_bucket). Max observed bucket: 3 (sf0.01), 10 (sf0.1), 63 (sf1),
#:   382 (sf10) — inert through sf1, trims only degenerate sf10+ buckets
#:   (byte-identical families belong to exact dedup upstream).
DF_CAP = 128
LSH_BUCKET_CAP = 64


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# portable SQL fragment generators (DuckDB side; Spark mirrors via operators)
# --------------------------------------------------------------------------

def dd_shingles(text: str, k: int = 3) -> str:
    """DuckDB distinct k-word shingles (1-based list indexing)."""
    toks = f"string_split({text}, ' ')"
    joined = " || ' ' || ".join(f"{toks}[i + {j}]" for j in range(k))
    return (
        f"CASE WHEN len({toks}) < {k} THEN [{text}] "
        f"ELSE list_distinct(list_transform(range(1, len({toks}) - {k - 2}), "
        f"i -> {joined})) END"
    )


def dd_hexbyte(h: str, i: int) -> str:
    """DuckDB: byte ``i`` (0-based) of a lowercase md5 hex string as INT —
    DuckDB 1.0 has no md5-over-BLOB or hex→int cast, so nibbles are looked
    up positionally (the multimodal stub hashes hex STRINGS for exactly this
    reason, operators/multimodal.py make_image_decoder)."""

    def nib(p: int) -> str:
        return f"(strpos('0123456789abcdef', substr({h}, {p}, 1)) - 1)"

    return f"({nib(2 * i + 1)} * 16 + {nib(2 * i + 2)})"


def dd_bucket(a: str, planes: list[list[int]]) -> str:
    cases = []
    for p, row in enumerate(planes):
        chain = " + ".join(f"{a}[{i + 1}]::DOUBLE * {v}.0" for i, v in enumerate(row))
        cases.append(f"(CASE WHEN ({chain}) > 0 THEN {2 ** p} ELSE 0 END)")
    return "CAST(" + " + ".join(cases) + " AS BIGINT)"


_PLANES = SIM.hyperplanes(N_PLANES, EMB_DIM)

#: derived file catalog over `documents` (shared by manifest/path queries)
_DD_FILENAME = "source || '/doc_' || doc_id::VARCHAR || '.json'"


# ==========================================================================
# A. Reference-pipeline operators (manifest semi-join, path rewrite, filters)
# ==========================================================================

_ARCHIVE_ORACLE = f"""
WITH manifest AS (SELECT {_DD_FILENAME} AS filename FROM documents),
-- WHERE mirrors the engine's P2 null-drop (qualify_manifest's na.drop —
-- the reference drops manifest rows without a filename before probing)
q AS (SELECT filename, 'lake/raw/' || filename AS source_path FROM manifest
      WHERE filename IS NOT NULL),
listing AS (
  SELECT 'lake/raw/' || {_DD_FILENAME} AS path FROM documents WHERE doc_id % 3 != 0
)
SELECT q.filename, q.source_path,
  CASE WHEN l.path IS NOT NULL THEN 'lake/archive/' || q.filename END AS target_path,
  CASE WHEN l.path IS NOT NULL THEN 'found' ELSE 'not_found' END AS status
FROM q LEFT JOIN listing l ON q.source_path = l.path
"""


def _derived_manifest(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    fname = F.concat(
        F.col("source"), F.lit("/doc_"), F.col("doc_id").cast("string"), F.lit(".json")
    )
    manifest = docs.select(fname.alias("filename"))
    listing = docs.where(F.col("doc_id") % 3 != 0).select(
        F.concat(F.lit("lake/raw/"), fname).alias("path")
    )
    return manifest, listing


@register("manifest_archive_plan", _ARCHIVE_ORACLE)
def q_manifest_archive_plan(spark, sf_dir):
    """Flagship: the reference's pipeline A (app/app.py:156-196) as one plan —
    manifest → prefix-qualify → broadcast semi/anti join vs listing → rewrite."""
    manifest, listing = _derived_manifest(spark, sf_dir)
    return build_archive_plan(
        manifest, listing, source_prefix="lake/raw", target_prefix="lake/archive"
    )


@register(
    "manifest_status_counts",
    f"WITH plan AS ({_ARCHIVE_ORACLE}) "
    "SELECT status, CAST(count(*) AS BIGINT) AS n FROM plan GROUP BY status",
)
def q_manifest_status_counts(spark, sf_dir):
    """A1/A2: found/not-found reconciliation totals (app/app.py:133-152)."""
    return (
        q_manifest_archive_plan(spark, sf_dir)
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "path_rewrite_ops",
    f"""
WITH m AS (SELECT doc_id, source, {_DD_FILENAME} AS filename FROM documents)
SELECT filename,
  'lake/raw/' || filename AS source_path,
  'lake/archive/' || filename AS target_path,
  -- NULL filenames propagate through every path op (the engine's
  -- basename/parent_dir NULL-propagate; degenerate-lake rule)
  CASE WHEN filename IS NULL THEN NULL
       ELSE 'doc_' || doc_id::VARCHAR || '.json' END AS base_name,
  'lake/raw/' || source AS parent
FROM m
""",
)
def q_path_rewrite_ops(spark, sf_dir):
    """P4-P8 in one projection (reference app/app.py:45-53,104-111;
    app/main.py:152-159,168)."""
    manifest, _ = _derived_manifest(spark, sf_dir)
    qualified = prefix_qualify(F.col("filename"), "lake/raw")
    return manifest.select(
        "filename",
        qualified.alias("source_path"),
        rewrite_prefix(qualified, "lake/raw", "lake/archive").alias("target_path"),
        basename(qualified).alias("base_name"),
        parent_dir(qualified).alias("parent"),
    )


@register(
    "path_rewrite_compat",
    f"""
WITH m AS (
  SELECT doc_id, {_DD_FILENAME} AS filename FROM documents
), p AS (
  SELECT CASE doc_id % 3
    WHEN 0 THEN 'lake/raw/' || filename
    WHEN 1 THEN 'staging/lake/raw/' || filename
    ELSE 'cold/' || filename END AS path
  FROM m
), r AS (
  SELECT path,
    CASE WHEN strpos(path, 'lake/raw') > 0
      THEN substr(path, 1, strpos(path, 'lake/raw') - 1) || 'lake/archive'
           || substr(path, strpos(path, 'lake/raw') + 8)
      ELSE path END AS replaced
  FROM p
)
SELECT path,
  CASE WHEN replaced = path
    THEN 'lake/archive/' || (string_split(path, '/'))[-1]
    ELSE replaced END AS compat_target,
  regexp_replace(
    CASE WHEN starts_with(path, 'lake/raw')
      THEN 'lake/archive/' || substr(path, 9)
      ELSE 'lake/archive/' || (string_split(path, '/'))[-1] END,
    '/+', '/', 'g') AS anchored_target
FROM r
""",
)
def q_path_rewrite_compat(spark, sf_dir):
    """P5 compat vs anchored side by side (VERDICT r01 #6): one third of the
    paths start with the prefix (both semantics agree), one third carry it
    mid-path (compat rewrites in place, anchored falls back to basename —
    the documented divergence, reference app/app.py:45), one third lack it
    entirely (both take the basename fallback)."""
    docs = _t(spark, sf_dir, "documents")
    filename = F.concat(
        F.col("source"), F.lit("/doc_"), F.col("doc_id").cast("string"), F.lit(".json")
    )
    path = (
        F.when(F.col("doc_id") % 3 == 0, F.concat(F.lit("lake/raw/"), filename))
        .when(F.col("doc_id") % 3 == 1, F.concat(F.lit("staging/lake/raw/"), filename))
        .otherwise(F.concat(F.lit("cold/"), filename))
    )
    paths = docs.select(path.alias("path"))
    return paths.select(
        "path",
        rewrite_prefix(
            F.col("path"), "lake/raw", "lake/archive", compat_replace_first=True
        ).alias("compat_target"),
        rewrite_prefix(F.col("path"), "lake/raw", "lake/archive").alias(
            "anchored_target"
        ),
    )


@register(
    "date_range_filter",
    "SELECT event_type, CAST(count(*) AS BIGINT) AS n_events FROM events "
    "WHERE ts >= TIMESTAMP '2024-01-10' AND ts <= TIMESTAMP '2024-01-20' "
    "GROUP BY event_type",
)
def q_date_range_filter(spark, sf_dir):
    """P9 date-range with optional bounds (reference app/main.py:119-136)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.where(
            date_range_predicate(
                F.col("ts"),
                after=dt.datetime(2024, 1, 10),
                before=dt.datetime(2024, 1, 20),
            )
        )
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


_JSON_ORACLE = (
    "SELECT event_type, CAST(count(*) AS BIGINT) AS n_events FROM events "
    "WHERE coalesce(json_extract_string(props, '$.k') = '42', FALSE) "
    "GROUP BY event_type"
)


@register("json_content_predicate", _JSON_ORACLE)
def q_json_content_predicate(spark, sf_dir):
    """P10 fast path: declarative JSON key probe (reference
    check_file_content, app/main.py:49-106)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.where(json_key_probe_fast("props", "k", "42"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


@register("json_probe_exact", _JSON_ORACLE)
def q_json_probe_exact(spark, sf_dir):
    """P10 exact path: Arrow pandas_udf replicating the reference's probe
    order bit-for-bit (app/main.py:68-106)."""
    ev = _t(spark, sf_dir, "events")
    probe = make_json_key_probe_exact("k", "42")
    return (
        ev.where(probe(F.col("props")))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


@register(
    "filter_reason_cascade",
    "SELECT CASE "
    "WHEN NOT coalesce(ts >= TIMESTAMP '2024-01-08', FALSE) THEN 'before date range' "
    "WHEN NOT coalesce(ts <= TIMESTAMP '2024-01-25', FALSE) THEN 'after date range' "
    "WHEN NOT coalesce(CAST(json_extract_string(props, '$.k') AS INT) <= 80, FALSE) "
    "THEN 'content mismatch' ELSE 'Matches all criteria' END AS reason, "
    "CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1",
)
def q_filter_reason_cascade(spark, sf_dir):
    """P12: ordered predicate conjunction with first-failure reason
    (reference should_process_file, app/main.py:109-146)."""
    ev = _t(spark, sf_dir, "events")
    reason = reason_cascade(
        (F.col("ts") >= F.lit(dt.datetime(2024, 1, 8)), "before date range"),
        (F.col("ts") <= F.lit(dt.datetime(2024, 1, 25)), "after date range"),
        (
            F.get_json_object(F.col("props"), "$.k").cast("int") <= 80,
            "content mismatch",
        ),
    )
    return ev.select(reason.alias("reason")).groupBy("reason").agg(
        F.count(F.lit(1)).alias("n")
    )


# ==========================================================================
# B. Relational core (joins, aggregations, windows, sorts, set ops)
# ==========================================================================

_DEC = "decimal(18,2)"
_D9 = "decimal(9,2)"


def _m2(col: str) -> F.Column:
    """Exact 2-dp money: cast→decimal, aggregate exactly, see module doc."""
    return F.col(col).cast(_DEC)


@register(
    "q1_pricing_summary",
    f"""
SELECT l_returnflag, l_linestatus,
  round(CAST(sum(CAST(l_quantity AS {_DEC})) AS DOUBLE), 2) AS sum_qty,
  round(CAST(sum(CAST(l_extendedprice AS {_DEC})) AS DOUBLE), 2) AS sum_base_price,
  round(CAST(sum(CAST(l_extendedprice AS {_D9}) * CAST(1 - l_discount AS {_D9})) AS DOUBLE), 2) AS sum_disc_price,
  round(CAST(sum(CAST(l_extendedprice AS {_D9}) * CAST(1 - l_discount AS {_D9}) * CAST(1 + l_tax AS {_D9})) AS DOUBLE), 2) AS sum_charge,
  round(CAST(sum(CAST(l_quantity AS {_DEC})) AS DOUBLE) / count(*), 6) AS avg_qty,
  round(CAST(sum(CAST(l_extendedprice AS {_DEC})) AS DOUBLE) / count(*), 6) AS avg_price,
  round(CAST(sum(CAST(l_discount AS {_DEC})) AS DOUBLE) / count(*), 6) AS avg_disc,
  CAST(count(*) AS BIGINT) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def q_q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: scan-heavy grouped aggregate; decimal-exact sums."""
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc = F.col("l_extendedprice").cast(_D9) * (1 - F.col("l_discount")).cast(_D9)
    charge = disc * (1 + F.col("l_tax")).cast(_D9)
    n = F.count(F.lit(1))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum(_m2("l_quantity")).cast("double"), 2).alias("sum_qty"),
        F.round(F.sum(_m2("l_extendedprice")).cast("double"), 2).alias("sum_base_price"),
        F.round(F.sum(disc).cast("double"), 2).alias("sum_disc_price"),
        F.round(F.sum(charge).cast("double"), 2).alias("sum_charge"),
        F.round(F.sum(_m2("l_quantity")).cast("double") / n, 6).alias("avg_qty"),
        F.round(F.sum(_m2("l_extendedprice")).cast("double") / n, 6).alias("avg_price"),
        F.round(F.sum(_m2("l_discount")).cast("double") / n, 6).alias("avg_disc"),
        n.cast("long").alias("count_order"),
    )


@register(
    "q3_shipping_priority",
    f"""
SELECT l_orderkey,
  round(CAST(sum(CAST(l_extendedprice AS {_D9}) * CAST(1 - l_discount AS {_D9})) AS DOUBLE), 2) AS revenue,
  strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01' AND l_shipdate > TIMESTAMP '1998-06-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC LIMIT 10
""",
)
def q_q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: selective join + grouped agg + deterministic top-k.
    customer is small → broadcast; the lineitem⋈orders join shuffles on the
    orderkey only after filters prune both sides."""
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderdate") < F.lit("1998-06-01").cast("timestamp"))
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > F.lit("1998-06-01").cast("timestamp"))
    disc = F.col("l_extendedprice").cast(_D9) * (1 - F.col("l_discount")).cast(_D9)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(disc).cast("double"), 2).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@register(
    "q5_region_revenue",
    f"""
SELECT r_name, n_name,
  round(CAST(sum(CAST(l_extendedprice AS {_D9}) * CAST(1 - l_discount AS {_D9})) AS DOUBLE), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
""",
)
def q_q5_region_revenue(spark, sf_dir):
    """TPC-H Q5 shape: star join; all dims broadcast, one fact shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    disc = F.col("l_extendedprice").cast(_D9) * (1 - F.col("l_discount")).cast(_D9)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.round(F.sum(disc).cast("double"), 2).alias("revenue"))
    )


@register(
    "top_customers",
    f"""
SELECT o_custkey AS custkey, any_value(c_name) AS c_name,
  CAST(count(*) AS BIGINT) AS n_orders,
  round(CAST(sum(CAST(o_totalprice AS {_DEC})) AS DOUBLE), 2) AS total_spent
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY o_custkey
ORDER BY total_spent DESC, custkey ASC LIMIT 10
""",
)
def q_top_customers(spark, sf_dir):
    """Grouped agg + broadcast dim join + deterministic top-k."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.any_value(F.col("c_name")).alias("c_name"),
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(_m2("o_totalprice")).cast("double"), 2).alias("total_spent"),
        )
        .orderBy(F.col("total_spent").desc(), F.col("custkey").asc())
        .limit(10)
    )


@register(
    "window_latest_order",
    """
SELECT o_custkey AS custkey, o_orderkey AS orderkey,
  strftime(o_orderdate, '%Y-%m-%d') AS orderdate
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders
) WHERE rn = 1
""",
)
def q_window_latest_order(spark, sf_dir):
    """Latest-row-per-key dedup — the manifest latest-per-QuoteId pattern
    (SURVEY.md §2.7) on orders."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
    )


@register(
    "window_running_revenue",
    f"""
SELECT o_custkey AS custkey, o_orderkey AS orderkey,
  round(CAST(sum(CAST(o_totalprice AS {_DEC})) OVER (
    PARTITION BY o_custkey
    ORDER BY o_orderdate NULLS FIRST, o_orderkey
    -- NULLS FIRST pinned: Spark's ASC default is nulls-first, DuckDB's is
    -- nulls-last — a NULL orderdate silently reorders the running sums
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 2) AS running_spent
FROM orders
""",
)
def q_window_running_revenue(spark, sf_dir):
    """Running aggregate over an explicit row frame (decimal-exact)."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        F.round(F.sum(_m2("o_totalprice")).over(w).cast("double"), 2).alias(
            "running_spent"
        ),
    )


@register(
    "window_rank_parts",
    f"""
SELECT p_partkey, p_brand,
  CAST(rank() OVER w AS BIGINT) AS rnk,
  CAST(dense_rank() OVER w AS BIGINT) AS drnk,
  round(CAST(lag(CAST(p_retailprice AS {_DEC})) OVER w AS DOUBLE), 2) AS prev_price
FROM part
WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey ASC)
""",
)
def q_window_rank_parts(spark, sf_dir):
    """rank / dense_rank / lag over one window definition."""
    p = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey").asc()
    )
    return p.select(
        "p_partkey",
        "p_brand",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.round(F.lag(_m2("p_retailprice")).over(w).cast("double"), 2).alias(
            "prev_price"
        ),
    )


@register(
    "semi_join_active_customers",
    "SELECT c_custkey, c_name FROM customer WHERE EXISTS "
    "(SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 100000)",
)
def q_semi_join_active_customers(spark, sf_dir):
    """J1 generalized: left-semi membership (the existence probe,
    reference app/app.py:115-131)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 100000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "anti_join_inactive_customers",
    "SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS "
    "(SELECT 1 FROM orders WHERE o_custkey = c_custkey)",
)
def q_anti_join_inactive_customers(spark, sf_dir):
    """J2: left-anti 'not found' set (reference app/app.py:127-135)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "set_ops_segments",
    """
(SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
 INTERSECT SELECT o_custkey FROM orders)
UNION
(SELECT c_custkey FROM customer WHERE c_acctbal < 0
 EXCEPT SELECT o_custkey FROM orders)
""",
)
def q_set_ops_segments(spark, sf_dir):
    """§2.6: INTERSECT / EXCEPT / UNION (distinct forms)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    building = c.where(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    negative = c.where(F.col("c_acctbal") < 0).select(
        F.col("c_custkey").alias("custkey")
    )
    return building.intersect(o).union(negative.subtract(o)).distinct()


@register(
    "agg_distinct_stats",
    f"""
SELECT c_mktsegment,
  CAST(count(*) AS BIGINT) AS n_customers,
  CAST(count(DISTINCT c_nationkey) AS BIGINT) AS n_nations,
  round(CAST(sum(CAST(c_acctbal AS {_DEC})) AS DOUBLE), 2) AS total_bal,
  round(CAST(min(CAST(c_acctbal AS {_DEC})) AS DOUBLE), 2) AS min_bal,
  round(CAST(max(CAST(c_acctbal AS {_DEC})) AS DOUBLE), 2) AS max_bal
FROM customer GROUP BY c_mktsegment
""",
)
def q_agg_distinct_stats(spark, sf_dir):
    """Distinct aggregate + min/max/sum in one grouped pass."""
    c = _t(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.round(F.sum(_m2("c_acctbal")).cast("double"), 2).alias("total_bal"),
        F.round(F.min(_m2("c_acctbal")).cast("double"), 2).alias("min_bal"),
        F.round(F.max(_m2("c_acctbal")).cast("double"), 2).alias("max_bal"),
    )


@register(
    "rollup_nation_region",
    """
SELECT coalesce(r_name, 'ALL') AS region, coalesce(n_name, 'ALL') AS nation,
  CAST(count(*) AS BIGINT) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
HAVING count(*) > 0  -- Spark emits NO grand-total row over an empty
                     -- input where DuckDB emits one with count 0;
                     -- every real rollup/cube group has count >= 1,
                     -- so this only drops the empty-input row
""",
)
def q_rollup_nation_region(spark, sf_dir):
    """ROLLUP hierarchy totals (region → nation → grand)."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            "n_customers",
        )
    )


@register(
    "cube_priority_status",
    f"""
SELECT coalesce(o_orderpriority, 'ALL') AS priority,
  coalesce(o_orderstatus, 'ALL') AS status,
  CAST(count(*) AS BIGINT) AS n_orders,
  round(CAST(sum(CAST(o_totalprice AS {_DEC})) AS DOUBLE), 2) AS total
FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)
HAVING count(*) > 0  -- Spark emits NO grand-total row over an empty
                     -- input where DuckDB emits one with count 0;
                     -- every real rollup/cube group has count >= 1,
                     -- so this only drops the empty-input row
""",
)
def q_cube_priority_status(spark, sf_dir):
    """CUBE over two dimensions."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(_m2("o_totalprice")).cast("double"), 2).alias("total"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "n_orders",
            "total",
        )
    )


@register(
    "orders_by_month",
    f"""
SELECT strftime(o_orderdate, '%Y-%m') AS month,
  CAST(count(*) AS BIGINT) AS n_orders,
  round(CAST(sum(CAST(o_totalprice AS {_DEC})) AS DOUBLE), 2) AS total,
  round(CAST(sum(CAST(o_totalprice AS {_DEC})) AS DOUBLE) / count(*), 6) AS avg_price
FROM orders GROUP BY 1
""",
)
def q_orders_by_month(spark, sf_dir):
    """Date bucketing + grouped aggregates (§2.8 date functions)."""
    o = _t(spark, sf_dir, "orders")
    n = F.count(F.lit(1))
    s = F.sum(_m2("o_totalprice")).cast("double")
    return o.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month")).agg(
        n.cast("long").alias("n_orders"),
        F.round(s, 2).alias("total"),
        F.round(s / n, 6).alias("avg_price"),
    )


@register(
    "asof_purchase_prior_view",
    """
SELECT p.event_id, p.user_id,
  epoch_ms(p.ts) AS purchase_ms,
  v.event_id AS asof_event_id,
  epoch_ms(v.ts) AS asof_view_ms
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND v.ts <= p.ts
""",
)
def q_asof_purchase_prior_view(spark, sf_dir):
    """As-of join (Spark-missing operator): latest prior 'view' per
    'purchase', built union+window — one shuffle, no inequality join."""
    ev = _t(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.where(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    joined = asof_join(
        purchases,
        views,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["event_id", "ts"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.unix_millis("ts").alias("purchase_ms"),
        F.col("asof_event_id"),
        F.unix_millis("asof_ts").alias("asof_view_ms"),
    )


@register(
    "range_join_value_buckets",
    f"""
SELECT b.label,
  CAST(count(*) AS BIGINT) AS n_events,
  round(CAST(sum(CAST(e.value AS {_DEC})) AS DOUBLE), 2) AS total_value
FROM events e JOIN (VALUES
  ('p00_10', 0.0, 10.0), ('p10_50', 10.0, 50.0),
  ('p50_100', 50.0, 100.0), ('p100_up', 100.0, 1e9)
) AS b(label, lo, hi) ON e.value >= b.lo AND e.value < b.hi
GROUP BY b.label
""",
)
def q_range_join_value_buckets(spark, sf_dir):
    """Range join against a broadcast interval dim."""
    ev = _t(spark, sf_dir, "events")
    spark_buckets = spark.createDataFrame(
        [
            ("p00_10", 0.0, 10.0),
            ("p10_50", 10.0, 50.0),
            ("p50_100", 50.0, 100.0),
            ("p100_up", 100.0, 1e9),
        ],
        ["label", "lo", "hi"],
    )
    joined = range_join(
        ev, spark_buckets, point_col="value", start_col="lo", end_col="hi"
    )
    return joined.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(_m2("value")).cast("double"), 2).alias("total_value"),
    )


@register(
    "sessionize_events",
    """
WITH x AS (
  SELECT user_id, ts, epoch_ms(ts) AS ms,
    lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ms
  FROM events
), f AS (
  SELECT user_id, ts, ms,
    CASE WHEN prev_ms IS NULL OR ms - prev_ms > 1800000 THEN 1 ELSE 0 END AS nf
  FROM x
), s AS (
  SELECT user_id, ms,
    sum(nf) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
  FROM f
)
SELECT user_id, CAST(sid AS BIGINT) AS session_id,
  CAST(count(*) AS BIGINT) AS n_events,
  min(ms) AS start_ms, max(ms) AS end_ms
FROM s GROUP BY user_id, sid
""",
)
def q_sessionize_events(spark, sf_dir):
    """Gaps-and-islands sessionization (30-min inactivity) — the batch twin
    of the streaming tier's session_window."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ms = F.unix_millis("ts")
    x = ev.select("user_id", "ts", ms.alias("ms")).withColumn(
        "prev_ms", F.lag("ms").over(w)
    )
    f = x.withColumn(
        "nf",
        F.when(
            F.col("prev_ms").isNull() | (F.col("ms") - F.col("prev_ms") > 1800000), 1
        ).otherwise(0),
    )
    s = f.withColumn("sid", F.sum("nf").over(wrun))
    return s.groupBy("user_id", F.col("sid").cast("long").alias("session_id")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ms").alias("start_ms"),
        F.max("ms").alias("end_ms"),
    )


@register(
    "hourly_event_stats",
    f"""
SELECT epoch_ms(date_trunc('hour', ts)) AS hour_ms, event_type,
  CAST(count(*) AS BIGINT) AS n,
  round(CAST(sum(CAST(value AS {_DEC})) AS DOUBLE), 2) AS total_value
FROM events GROUP BY 1, 2
""",
)
def q_hourly_event_stats(spark, sf_dir):
    """Tumbling-window aggregate (batch form; streaming/ runs the same plan
    incrementally with a watermark)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(
        F.unix_millis(F.date_trunc("hour", F.col("ts"))).alias("hour_ms"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(_m2("value")).cast("double"), 2).alias("total_value"),
    )


@register(
    "approx_distinct_users",
    """
SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
  TRUE AS within_tolerance
FROM events GROUP BY 1
""",
)
def q_approx_distinct_users(spark, sf_dir):
    """approx_count_distinct (HLL, rsd=0.05) self-checked in-query against
    the exact distinct count (VERDICT r01 #5): ``within_tolerance`` asserts
    the sketch landed inside 3×rsd of truth, so the driver hash-verifies the
    error envelope; the raw sketch value is engine-specific and deliberately
    not emitted. The exact twin aggregate lives in agg_distinct_stats."""
    ev = _t(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.05).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    err = F.abs(F.col("approx_users") - F.col("exact_users"))
    return agg.select(
        "event_type",
        "exact_users",
        (err <= F.col("exact_users") * F.lit(3 * 0.05)).alias("within_tolerance"),
    )


# ==========================================================================
# C. LLM-data-pipeline operators (dedup, similarity, text analysis)
# ==========================================================================


@register(
    "dedup_exact",
    "SELECT md5(text) AS digest, min(doc_id) AS keep_id, "
    "CAST(count(*) AS BIGINT) AS n_copies FROM documents GROUP BY 1",
)
def q_dedup_exact(spark, sf_dir):
    """Exact dedup via content digest — shuffle carries 32B digests only."""
    return D.dedup_exact(_t(spark, sf_dir, "documents"), "doc_id")


def dd_jaccard_pairs_ctes(
    threshold: float, src: str = "documents"
) -> tuple[str, str]:
    """(CTE list, final select) of the capped exact-Jaccard pair oracle —
    the DuckDB mirror of ``operators/dedup.jaccard_pairs(max_df=DF_CAP)``:
    shingles with document frequency above DF_CAP are excluded from
    candidate DISCOVERY (the stop-shingle drop), surviving distinct pairs
    are then scored EXACTLY over the full shingle sets, so the emitted
    jaccard values are identical to the uncapped query wherever the cap
    is inert (every parity scale). CTE names are ``j``-prefixed so the
    fragment composes with _minhash_ctes in one WITH clause."""
    li = "len(list_intersect(da.ss, db.ss))"
    ctes = f"""jd AS (SELECT doc_id, {dd_shingles('text')} AS ss FROM {src}),
jsh AS (SELECT doc_id, unnest(ss) AS shingle FROM jd),
jshc AS (
  SELECT doc_id, shingle FROM (
    SELECT doc_id, shingle, count(*) OVER (PARTITION BY shingle) AS df
    FROM jsh
  ) WHERE df <= {DF_CAP}
),
jcand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM jshc a JOIN jshc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
)"""
    final = f"""SELECT jcand.id_a, jcand.id_b,
  round({li} / (len(da.ss) + len(db.ss) - {li}), 6) AS jaccard
FROM jcand
JOIN jd da ON da.doc_id = jcand.id_a
JOIN jd db ON db.doc_id = jcand.id_b
WHERE round({li} / (len(da.ss) + len(db.ss) - {li}), 6) >= {threshold}"""
    return ctes, final


def _minhash_ctes(src: str = "documents") -> tuple[str, str]:
    """(CTE list, final pair-select) of the minhash-LSH oracle — shared by
    the pair query, the recursive connected-components oracle, and (via
    ``src``) the doc-sampled eval twins."""
    # mirror of operators/dedup.minhash_signatures: hash i = 32-bit integer
    # slice of a 2-md5 digest string, minimized (hex_value_sql arithmetic is
    # valid in both engines)
    n_md5 = (MINHASHES + 3) // 4
    digest = " || ".join(
        "md5(s)" if j == 0 else f"md5('x{j}:' || s)" for j in range(n_md5)
    )
    sig_cols = ", ".join(
        "list_aggregate(list_transform(ss, s -> CAST({hv} AS BIGINT)), 'min') AS mh{i}".format(
            hv=D.hex_value_sql(f"substr({digest}, {8 * i + 1}, 8)", 8), i=i
        )
        for i in range(MINHASHES)
    )
    rpb = MINHASHES // BANDS
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, 'b{b}' || '|' || {cols} AS band_key FROM sig".format(
            b=b,
            cols=" || '|' || ".join(f"mh{b * rpb + r}" for r in range(rpb)),
        )
        for b in range(BANDS)
    )
    ctes = f"""d AS (SELECT doc_id, {dd_shingles('text')} AS ss FROM {src}),
sh AS (SELECT doc_id, unnest(ss) AS shingle FROM d),
sig AS (SELECT doc_id, {sig_cols} FROM d),
bands AS ({band_selects}),
bandsc AS (
  SELECT doc_id, band_key FROM (
    SELECT doc_id, band_key, count(*) OVER (PARTITION BY band_key) AS bn
    FROM bands
  ) WHERE bn <= {LSH_BUCKET_CAP}
),
cand AS (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
  FROM bandsc l JOIN bandsc r USING (band_key) WHERE l.doc_id < r.doc_id
),
sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS c
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)"""
    final = f"""SELECT i.id_a, i.id_b, round(i.c / (sa.n_sh + sb.n_sh - i.c), 6) AS jaccard
FROM inter i
JOIN cand USING (id_a, id_b)
JOIN sizes sa ON sa.doc_id = i.id_a
JOIN sizes sb ON sb.doc_id = i.id_b
WHERE round(i.c / (sa.n_sh + sb.n_sh - i.c), 6) >= {JACCARD_T}"""
    return ctes, final


def _minhash_oracle() -> str:
    ctes, final = _minhash_ctes()
    return f"WITH {ctes}\n{final}"


@register("dedup_minhash_lsh", _minhash_oracle())
def q_dedup_minhash_lsh(spark, sf_dir):
    """MinHash+LSH near-dup pairs, exact-Jaccard-verified: shingle → minhash
    signature → band buckets (capped at LSH_BUCKET_CAP — the degenerate-
    corpus guard, inert through stress sf1) → candidate pairs → verify ≥
    threshold."""
    docs = _t(spark, sf_dir, "documents")
    sigs = D.minhash_signatures(docs, "doc_id", num_hashes=MINHASHES)
    cands = D.lsh_candidate_pairs(
        sigs, "doc_id", num_hashes=MINHASHES, bands=BANDS,
        max_bucket=LSH_BUCKET_CAP,
    )
    return D.jaccard_pairs(docs, "doc_id", threshold=JACCARD_T, candidates=cands)


def _jaccard_oracle() -> str:
    ctes, final = dd_jaccard_pairs_ctes(JACCARD_T)
    return f"WITH {ctes}\n{final}"


@register("dedup_ngram_jaccard", _jaccard_oracle())
def q_dedup_ngram_jaccard(spark, sf_dir):
    """Exact n-gram Jaccard pairs via the shingle inverted index — never
    all-pairs, and since r12 never quadratic either: discovery drops
    postings hotter than DF_CAP (inert at every parity scale), pairs then
    verify exactly over full shingle sets (operators/dedup.jaccard_pairs
    ``max_df`` docstring has the measured Σdf² numbers)."""
    return D.jaccard_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", threshold=JACCARD_T,
        max_df=DF_CAP,
    )


def _simhash_oracle(bits: int = 16) -> str:
    hv_of = D.hex_value_sql("md5(t)", 4)
    sums = ", ".join(
        f"list_aggregate(list_transform(hvs, x -> CASE WHEN "
        f"CAST(floor(x / {2 ** j}) AS BIGINT) % 2 = 1 THEN 1 ELSE -1 END), 'sum') AS s{j}"
        for j in range(bits)
    )
    fp = " + ".join(f"(CASE WHEN s{j} > 0 THEN {2 ** j} ELSE 0 END)" for j in range(bits))
    return f"""
WITH hv AS (
  SELECT doc_id,
    list_transform(string_split(text, ' '), t -> CAST({hv_of} AS BIGINT)) AS hvs
  FROM documents
),
s AS (SELECT doc_id, {sums} FROM hv)
SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM s
"""


@register("simhash_fingerprints", _simhash_oracle())
def q_simhash_fingerprints(spark, sf_dir):
    """SimHash (16-bit) document fingerprints."""
    return D.simhash(_t(spark, sf_dir, "documents"), "doc_id", bits=16)


_ANN_ORACLE = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
    {dd_cosine('q.qv', 'e.embedding')} AS cosine_sim
  FROM embeddings e, q WHERE e.vec_id <> q.query_id
),
r AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id ASC) AS rn
  FROM scored
)
SELECT query_id, neighbor_id, cosine_sim, CAST(rn AS INT) AS rnk
FROM r WHERE rn <= 10
"""


@register("ann_brute_force", _ANN_ORACLE)
def q_ann_brute_force(spark, sf_dir):
    """Exact cosine top-10 for 5 query vectors — the ANN correctness
    baseline; corpus scan is shuffle-free, queries broadcast."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return SIM.brute_force_topk(emb, queries, k=10)


def _ann_lsh_oracle() -> str:
    b = dd_bucket("embedding", _PLANES)
    return f"""
WITH b AS (SELECT vec_id, embedding, {b} AS bucket FROM embeddings),
q AS (SELECT vec_id AS query_id, embedding AS qv, bucket FROM b WHERE vec_id < 5),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
    {dd_cosine('q.qv', 'c.embedding')} AS cosine_sim
  FROM b c JOIN q USING (bucket) WHERE c.vec_id <> q.query_id
),
r AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id ASC) AS rn
  FROM scored
)
SELECT query_id, neighbor_id, cosine_sim, CAST(rn AS INT) AS rnk
FROM r WHERE rn <= 10
"""


@register("ann_lsh_bucketed", _ann_lsh_oracle())
def q_ann_lsh_bucketed(spark, sf_dir):
    """Approximate top-k: sign-random-projection LSH buckets limit each
    query's candidate set — the 100 TB scale path."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return SIM.lsh_bucketed_topk(emb, queries, k=10, n_planes=N_PLANES, dim=EMB_DIM)


_PLANES_T1 = SIM.hyperplanes(N_PLANES, EMB_DIM, table=1)


def _ann_multitable_oracle() -> str:
    b0 = dd_bucket("embedding", _PLANES)
    b1 = dd_bucket("embedding", _PLANES_T1)
    return f"""
WITH b0 AS (SELECT vec_id, embedding, {b0} AS bucket FROM embeddings),
b1 AS (SELECT vec_id, embedding, {b1} AS bucket FROM embeddings),
q0 AS (SELECT vec_id AS query_id, embedding AS qv, bucket FROM b0 WHERE vec_id < 5),
q1 AS (SELECT vec_id AS query_id, embedding AS qv, bucket FROM b1 WHERE vec_id < 5),
scored AS (
  SELECT q0.query_id, c.vec_id AS neighbor_id,
    {dd_cosine('q0.qv', 'c.embedding')} AS cosine_sim
  FROM b0 c JOIN q0 USING (bucket) WHERE c.vec_id <> q0.query_id
  UNION
  SELECT q1.query_id, c.vec_id AS neighbor_id,
    {dd_cosine('q1.qv', 'c.embedding')} AS cosine_sim
  FROM b1 c JOIN q1 USING (bucket) WHERE c.vec_id <> q1.query_id
),
r AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id ASC) AS rn
  FROM scored
)
SELECT query_id, neighbor_id, cosine_sim, CAST(rn AS INT) AS rnk
FROM r WHERE rn <= 10
"""


@register("ann_lsh_multitable", _ann_multitable_oracle())
def q_ann_lsh_multitable(spark, sf_dir):
    """Multi-table LSH top-k (VERDICT r01 #4): two independent hyperplane
    families, candidates unioned and deduped — the recall-recovery dial that
    pairs with raising n_planes at corpus scale. The corpus is scanned once
    (buckets exploded per table), never re-read."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return SIM.lsh_bucketed_topk(
        emb, queries, k=10, n_planes=N_PLANES, dim=EMB_DIM, n_tables=2
    )


M_PROBES = 2


def _ann_multiprobe_oracle() -> str:
    b = dd_bucket("embedding", _PLANES)

    def chain(row):
        return " + ".join(f"qv[{i + 1}]::DOUBLE * {v}.0" for i, v in enumerate(row))

    arms = "\n  UNION ALL ".join(
        f"SELECT query_id, {p} AS p, abs({chain(row)}) AS a FROM q"
        for p, row in enumerate(_PLANES)
    )
    return f"""
WITH b AS (SELECT vec_id, embedding, {b} AS bucket FROM embeddings),
q AS (SELECT vec_id AS query_id, embedding AS qv, bucket AS qb FROM b WHERE vec_id < 5),
qp AS (
  {arms}
),
fl AS (
  SELECT query_id, p FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY a ASC, p ASC) AS rn
    FROM qp
  ) WHERE rn <= {M_PROBES}
),
probes AS (
  SELECT query_id, qv, qb AS probe FROM q
  UNION ALL
  SELECT q.query_id, q.qv, xor(q.qb, CAST(1 AS BIGINT) << fl.p) AS probe
  FROM q JOIN fl USING (query_id)
),
scored AS (
  SELECT pr.query_id, c.vec_id AS neighbor_id,
    {dd_cosine('pr.qv', 'c.embedding')} AS cosine_sim
  FROM b c JOIN probes pr ON c.bucket = pr.probe
  WHERE c.vec_id <> pr.query_id
),
r AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id ASC) AS rn
  FROM scored
)
SELECT query_id, neighbor_id, cosine_sim, CAST(rn AS INT) AS rnk
FROM r WHERE rn <= 10
"""


@register("ann_lsh_multiprobe", _ann_multiprobe_oracle())
def q_ann_lsh_multiprobe(spark, sf_dir):
    """Multi-probe LSH top-k (Lv et al. 2007): each query also probes the
    2 buckets reached by flipping its least-confident hyperplane bits —
    recall recovery WITHOUT multi-table's extra index copies (the corpus
    is bucketed and stored once; only the broadcast query side fans out).
    Read against ann_lsh_bucketed (same planes, home bucket only) and
    ann_lsh_multitable (recall via independent tables) — the three recall
    dials a production LSH deployment chooses between
    (operators/similarity.lsh_multiprobe_topk)."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return SIM.lsh_multiprobe_topk(
        emb, queries, k=10, n_planes=N_PLANES, dim=EMB_DIM, m_probes=M_PROBES
    )


def _near_dup_oracle() -> str:
    b = dd_bucket("embedding", _PLANES)
    cos = dd_cosine("a.embedding", "x.embedding")
    return f"""
WITH b AS (SELECT vec_id, embedding, {b} AS bucket FROM embeddings)
SELECT a.vec_id AS id_a, x.vec_id AS id_b, {cos} AS cosine_sim
FROM b a JOIN b x ON a.bucket = x.bucket AND a.vec_id < x.vec_id
WHERE {cos} >= {NEAR_DUP_T}
"""


@register("embedding_near_dup", _near_dup_oracle())
def q_embedding_near_dup(spark, sf_dir):
    """Embedding-cosine near-dup pairs within LSH buckets (no all-pairs)."""
    return SIM.embedding_near_dup_pairs(
        _t(spark, sf_dir, "embeddings"),
        threshold=NEAR_DUP_T,
        n_planes=N_PLANES,
        dim=EMB_DIM,
    )


def _lang_oracle() -> str:
    toks = "string_split(text, ' ')"
    scores = {}
    for lang, words in sorted(TXT.LANG_MARKERS.items()):
        inlist = ", ".join(f"'{w}'" for w in words)
        scores[lang] = (
            f"round(len(list_filter({toks}, t -> t IN ({inlist})))::DOUBLE"
            f" / len({toks}), 6)"
        )
    gr = "greatest(" + ", ".join(f"score_{lang}" for lang in sorted(scores)) + ")"
    case = (
        f"CASE WHEN {gr} IS NULL OR {gr} = 0 THEN 'unknown' "
        + " ".join(
            f"WHEN score_{lang} = {gr} THEN '{lang}'" for lang in sorted(scores)
        )
        + " END"
    )
    inner = ", ".join(f"{sql} AS score_{lang}" for lang, sql in sorted(scores.items()))
    return (
        f"SELECT doc_id, score_de, score_en, score_es, score_fr, {case} AS pred_lang "
        f"FROM (SELECT doc_id, {inner} FROM documents)"
    )


@register("lang_id", _lang_oracle())
def q_lang_id(spark, sf_dir):
    """Marker-token language-ID heuristic with per-language scores."""
    docs = _t(spark, sf_dir, "documents")
    return TXT.lang_scores(docs).select(
        "doc_id", "score_de", "score_en", "score_es", "score_fr", "pred_lang"
    )


_STOP_IN = ", ".join(f"'{w}'" for w in TXT.STOPWORDS)

_QUALITY_ORACLE = f"""
SELECT doc_id, n_tokens,
  round((length(text) - (n_tokens - 1)) / n_tokens, 6) AS mean_tok_len,
  round(stop_hits / n_tokens, 6) AS stopword_ratio,
  round(punct_hits / length(text), 6) AS punct_ratio,
  round(0.4 * least(n_tokens / 100.0, 1.0)
        + least(0.3 * (stop_hits / n_tokens) * 4, 0.3)
        + 0.3 * (1 - punct_hits / length(text)), 6) AS quality
FROM (
  SELECT doc_id, text,
    len(string_split(text, ' ')) AS n_tokens,
    len(list_filter(string_split(text, ' '), t -> t IN ({_STOP_IN}))) AS stop_hits,
    len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS punct_hits
  FROM documents
)
"""


@register("quality_scores", _QUALITY_ORACLE)
def q_quality_scores(spark, sf_dir):
    """Gopher/C4-style quality heuristics + composite score."""
    docs = _t(spark, sf_dir, "documents")
    return TXT.quality_score(docs).select(
        "doc_id", "n_tokens", "mean_tok_len", "stopword_ratio", "punct_ratio", "quality"
    )


@register(
    "token_counts",
    f"""
SELECT doc_id,
  CAST(len(string_split(text, ' ')) AS INT) AS n_ws_tokens,
  CAST(len(regexp_extract_all(text, '{TXT.BPE_ISH_PATTERN}')) AS INT) AS n_bpe_tokens
FROM documents
""",
)
def q_token_counts(spark, sf_dir):
    """Whitespace + BPE-ish regex token counting."""
    docs = _t(spark, sf_dir, "documents")
    return TXT.token_stats(docs).select("doc_id", "n_ws_tokens", "n_bpe_tokens")


@register(
    "doc_fingerprint",
    f"""
SELECT doc_id,
  list_aggregate(list_transform({dd_shingles('text', 5)}, s -> md5(s)), 'min')
    AS fingerprint
FROM documents
""",
)
def q_doc_fingerprint(spark, sf_dir):
    """Min-hash document fingerprint over 5-word shingles (winnowing-style)."""
    return TXT.fingerprint(_t(spark, sf_dir, "documents"), "doc_id", k=5)


# ==========================================================================
# D. Relational breadth (outer joins, set ops, grouping sets, subqueries,
#    scalar function suites)
# ==========================================================================


@register(
    "left_outer_customer_orders",
    f"""
SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS n_orders,
  round(CAST(coalesce(sum(CAST(o_totalprice AS {_DEC})), 0) AS DOUBLE), 2) AS total_spent
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
""",
)
def q_left_outer_customer_orders(spark, sf_dir):
    """LEFT OUTER join keeping order-less customers (count=0, total=0)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(
                F.coalesce(F.sum(_m2("o_totalprice")), F.lit(0)).cast("double"), 2
            ).alias("total_spent"),
        )
    )


@register(
    "full_outer_nation_presence",
    """
SELECT coalesce(c.k, s.k) AS nationkey,
  CAST(coalesce(c.n_cust, 0) AS BIGINT) AS n_cust,
  CAST(coalesce(s.n_supp, 0) AS BIGINT) AS n_supp
FROM (SELECT c_nationkey AS k, count(*) AS n_cust FROM customer WHERE c_nationkey < 10 GROUP BY 1) c
FULL JOIN (SELECT s_nationkey AS k, count(*) AS n_supp FROM supplier GROUP BY 1) s
  ON c.k = s.k
""",
)
def q_full_outer_nation_presence(spark, sf_dir):
    """FULL OUTER join over two aggregated sides (unmatched keys on both)."""
    c = (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_nationkey") < 10)
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return (
        c.alias("c")
        .join(s.alias("s"), F.col("c.k") == F.col("s.k"), "full")
        .select(
            F.coalesce(F.col("c.k"), F.col("s.k")).alias("nationkey"),
            F.coalesce(F.col("c.n_cust"), F.lit(0)).alias("n_cust"),
            F.coalesce(F.col("s.n_supp"), F.lit(0)).alias("n_supp"),
        )
    )


@register(
    "union_all_activity",
    """
SELECT key, kind, CAST(count(*) AS BIGINT) AS n FROM (
  SELECT o_custkey AS key, 'order' AS kind FROM orders
  UNION ALL
  SELECT user_id AS key, 'event' AS kind FROM events
) GROUP BY key, kind
""",
)
def q_union_all_activity(spark, sf_dir):
    """UNION ALL of two heterogeneous sources into one keyed tally."""
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("key"), F.lit("order").alias("kind")
    )
    e = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("key"), F.lit("event").alias("kind")
    )
    return o.unionByName(e).groupBy("key", "kind").agg(F.count(F.lit(1)).alias("n"))


@register(
    "grouping_sets_orders",
    f"""
SELECT coalesce(o_orderstatus, 'ALL') AS status,
  coalesce(o_orderpriority, 'ALL') AS priority,
  CAST(count(*) AS BIGINT) AS n_orders,
  round(CAST(sum(CAST(o_totalprice AS {_DEC})) AS DOUBLE), 2) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
HAVING count(*) > 0  -- Spark emits NO grand-total row over an empty
                     -- input where DuckDB emits one with count 0;
                     -- every real rollup/cube group has count >= 1,
                     -- so this only drops the empty-input row
""",
)
def q_grouping_sets_orders(spark, sf_dir):
    """Explicit GROUPING SETS (via Spark SQL on a registered view)."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        f"""
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
          coalesce(o_orderpriority, 'ALL') AS priority,
          count(*) AS n_orders,
          round(CAST(sum(CAST(o_totalprice AS {_DEC})) AS DOUBLE), 2) AS total
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "topk_per_group_parts",
    f"""
SELECT p_brand, p_partkey,
  round(CAST(CAST(p_retailprice AS {_DEC}) AS DOUBLE), 2) AS price,
  CAST(rn AS INT) AS rn
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey ASC) AS rn
  FROM part
) WHERE rn <= 3
""",
)
def q_topk_per_group_parts(spark, sf_dir):
    """Per-group top-k (window + filter — Spark's rank-pushdown pattern)."""
    p = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey").asc()
    )
    return (
        p.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select(
            "p_brand",
            "p_partkey",
            F.round(_m2("p_retailprice").cast("double"), 2).alias("price"),
            F.col("rn").cast("int").alias("rn"),
        )
    )


@register(
    "string_funcs_suite",
    """
SELECT p_partkey,
  upper(p_name) AS name_upper,
  lower(p_brand) AS brand_lower,
  substr(p_type, 1, 5) AS type_prefix,
  replace(p_name, ' ', '_') AS name_snake,
  lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
  CAST(length(p_name) AS INT) AS name_len,
  reverse(p_brand) AS brand_rev,
  concat_ws('|', p_brand, p_type) AS brand_type,
  translate(p_name, 'aeiou', 'AEIOU') AS name_tr
FROM part
""",
)
def q_string_funcs_suite(spark, sf_dir):
    """§2.8 scalar string breadth in one projection."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.length("p_name").cast("int").alias("name_len"),
        F.reverse(F.col("p_brand")).alias("brand_rev"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.translate(F.col("p_name"), "aeiou", "AEIOU").alias("name_tr"),
    )


@register(
    "date_funcs_suite",
    """
SELECT o_orderkey,
  CAST(year(o_orderdate) AS INT) AS y,
  CAST(month(o_orderdate) AS INT) AS m,
  CAST(day(o_orderdate) AS INT) AS d,
  CAST(quarter(o_orderdate) AS INT) AS q,
  CAST(isodow(o_orderdate) - 1 AS INT) AS wd,
  strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
  CAST(datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INT) AS days_since
FROM orders
""",
)
def q_date_funcs_suite(spark, sf_dir):
    """§2.8 date/time breadth (weekday normalized to 0=Monday both sides)."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.quarter("o_orderdate").alias("q"),
        F.weekday("o_orderdate").alias("wd"),
        F.date_format(F.date_add(F.col("o_orderdate"), 30), "yyyy-MM-dd").alias("plus30"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")).alias("days_since"),
    )


@register(
    "percentile_prices",
    """
SELECT p_brand,
  round(quantile_cont(p_retailprice, 0.5), 4) AS median_price,
  round(quantile_cont(p_retailprice, 0.9), 4) AS p90_price,
  CAST(count(*) AS BIGINT) AS n
FROM part GROUP BY p_brand
""",
)
def q_percentile_prices(spark, sf_dir):
    """Exact interpolated percentiles per group."""
    p = _t(spark, sf_dir, "part")
    return p.groupBy("p_brand").agg(
        F.round(F.percentile("p_retailprice", F.lit(0.5)), 4).alias("median_price"),
        F.round(F.percentile("p_retailprice", F.lit(0.9)), 4).alias("p90_price"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "scalar_subquery_above_avg",
    f"""
SELECT p_brand, CAST(count(*) AS BIGINT) AS n_above
FROM part
WHERE p_retailprice > (
  SELECT CAST(sum(CAST(p_retailprice AS {_DEC})) AS DOUBLE) / count(*) FROM part
)
GROUP BY p_brand
""",
)
def q_scalar_subquery_above_avg(spark, sf_dir):
    """Scalar-subquery filter (decimal-exact global average, broadcast)."""
    p = _t(spark, sf_dir, "part")
    avg_df = p.agg(
        (F.sum(_m2("p_retailprice")).cast("double") / F.count(F.lit(1))).alias("avg_price")
    )
    return (
        p.crossJoin(F.broadcast(avg_df))
        .where(F.col("p_retailprice") > F.col("avg_price"))
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_above"))
    )


@register(
    "props_key_stats",
    """
SELECT event_type,
  CAST(min(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS min_k,
  CAST(max(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS max_k,
  round(CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS DOUBLE) / count(*), 6) AS avg_k,
  CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY event_type
""",
)
def q_props_key_stats(spark, sf_dir):
    """JSON-extracted numeric aggregation over the dynamic props column."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.min(k).cast("int").alias("min_k"),
        F.max(k).cast("int").alias("max_k"),
        F.round(F.sum(k).cast("double") / F.count(F.lit(1)), 6).alias("avg_k"),
        F.count(F.lit(1)).alias("n"),
    )


# ==========================================================================
# E. Multimodal — the stub codec is md5-derived on purpose, so the full
#    binary → Arrow decode → pool pipeline has a bit-exact SQL oracle (the
#    same trick simhash uses, operators/dedup.py). Features are digest
#    bytes / 256 (exact in float32 AND float64), pooled means are k/512 —
#    no rounding epsilon anywhere.
# ==========================================================================

#: DuckDB replica of operators/multimodal.synth_media's content, as hex text
_DD_MEDIA_HEX = " || ".join(
    f"md5('m{i}:' || doc_id::VARCHAR)" for i in range(4)
)


def _dd_decode_oracle() -> str:
    b = [dd_hexbyte("h", i) for i in range(16)]
    pooled = ",\n  ".join(
        f"CAST({b[2 * i]} + {b[2 * i + 1]} AS DOUBLE) / 512.0 AS f{i}"
        for i in range(8)
    )
    return f"""
WITH m AS (
  SELECT doc_id AS media_id, {_DD_MEDIA_HEX} AS hex FROM documents
), d AS (
  SELECT media_id, md5(hex) AS h FROM m
)
SELECT media_id, 'image/fake' AS mime,
  CAST(16 + {b[0]} % 64 AS INTEGER) AS width,
  CAST(16 + {b[1]} % 64 AS INTEGER) AS height,
  CAST(3 AS INTEGER) AS channels,
  {pooled}
FROM d
"""


@register("multimodal_decode_features", _dd_decode_oracle())
def q_multimodal_decode_features(spark, sf_dir):
    """Binary media → Arrow-batched decode (stub codec) → pooled features,
    projected to driver-hashable scalars (f0..f7 doubles, exact k/512 values;
    arrays stay in the operator API and are covered by tests/test_multimodal).
    Oracle recomputes the md5-stub decode + stride-2 mean pooling in SQL."""
    from py_datalake_move_files_spark.operators.multimodal import (
        decode_images,
        resize_features,
        synth_media,
    )

    docs = _t(spark, sf_dir, "documents")
    media = synth_media(docs, "doc_id")
    decoded = resize_features(decode_images(media), out_dim=8)
    return decoded.select(
        "media_id",
        "mime",
        "width",
        "height",
        "channels",
        *[F.element_at("feature_pooled", i + 1).alias(f"f{i}") for i in range(8)],
    )


def _dd_frames_oracle() -> str:
    b2 = dd_hexbyte("h", 2)
    return f"""
WITH m AS (
  SELECT doc_id AS media_id, {_DD_MEDIA_HEX} AS hex FROM documents
), d AS (
  SELECT media_id, hex, least(8, 1 + {b2} % 8) AS n_frames FROM (
    SELECT media_id, hex, md5(hex) AS h FROM m
  )
), f AS (
  SELECT media_id, hex,
         unnest(generate_series(0, n_frames - 1)) AS frame_idx
  FROM d
)
SELECT media_id,
  CAST(frame_idx AS INTEGER) AS frame_idx,
  CAST(frame_idx * 1000 AS BIGINT) AS frame_ms,
  md5(hex || ':' || frame_idx::VARCHAR) AS frame_digest
FROM f
"""


@register("multimodal_frame_sample", _dd_frames_oracle())
def q_multimodal_frame_sample(spark, sf_dir):
    """Video-style frame sampling (UDTF-shaped mapInPandas — output rows ≠
    input rows). Frame count + digests are md5-derived from the content hex,
    so the SQL oracle reproduces the whole expansion."""
    from py_datalake_move_files_spark.operators.multimodal import (
        sample_frames,
        synth_media,
    )

    docs = _t(spark, sf_dir, "documents")
    return sample_frames(synth_media(docs, "doc_id"), every_ms=1000, max_frames=8)


@register(
    "window_range_frame",
    f"""
SELECT event_id, user_id,
  round(CAST(sum(CAST(value AS {_DEC})) OVER (
    PARTITION BY user_id ORDER BY epoch_ms(ts)
    RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW) AS DOUBLE), 2)
    AS trailing_1h_value
FROM events
""",
)
def q_window_range_frame(spark, sf_dir):
    """RANGE frame: per-user trailing-1-hour value sum (event-time sliding
    aggregate — the batch twin of a sliding stream window)."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_millis("ts"))
        .rangeBetween(-3600000, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.sum(_m2("value")).over(w).cast("double"), 2).alias(
            "trailing_1h_value"
        ),
    )


@register(
    "window_lead_gap",
    """
SELECT event_id, user_id,
  CAST(lead(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts) - epoch_ms(ts)
    AS BIGINT) AS ms_to_next
FROM events
""",
)
def q_window_lead_gap(spark, sf_dir):
    """lead(): time to the user's next event (null on their last)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    ms = F.unix_millis("ts")
    return ev.select(
        "event_id",
        "user_id",
        (F.lead(ms).over(w) - ms).cast("long").alias("ms_to_next"),
    )


def _cluster_oracle() -> str:
    ctes, final = _minhash_ctes()
    return f"""
WITH RECURSIVE {ctes},
pairs AS ({final}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION SELECT id_b, id_a FROM pairs
),
reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
)
SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
FROM reach GROUP BY src
"""


def dedup_cluster_cc(spark, sf_dir):
    """The near-dup cluster map ``(node, cluster_id)`` — MinHash → LSH
    banding → exact-Jaccard verify → iterative min-label CC — built ONCE
    per (documents snapshot, dedup params) and served from the session
    artifact cache.  Four registered passes consume it (assignment,
    canonical docs, leakage-safe split, family-size census); in
    production the cluster map is a curation artifact computed at dedup
    time and reused, not re-derived per pass (functions/artifacts.py
    documents the cache-key discipline)."""
    from py_datalake_move_files_spark.catalog import table_snapshot
    from py_datalake_move_files_spark.functions.artifacts import shared_artifact
    from py_datalake_move_files_spark.operators.clusters import connected_components

    def build():
        docs = _t(spark, sf_dir, "documents")
        sigs = D.minhash_signatures(docs, "doc_id", num_hashes=MINHASHES)
        cands = D.lsh_candidate_pairs(
            sigs, "doc_id", num_hashes=MINHASHES, bands=BANDS,
            max_bucket=LSH_BUCKET_CAP,
        )
        pairs = D.jaccard_pairs(
            docs, "doc_id", threshold=JACCARD_T, candidates=cands
        )
        return connected_components(pairs)

    key = (
        "dedup_cluster_cc",
        table_snapshot(sf_dir, "documents"),
        MINHASHES,
        BANDS,
        JACCARD_T,
        LSH_BUCKET_CAP,
    )
    return shared_artifact(spark, key, build)


@register("dedup_cluster_assignment", _cluster_oracle())
def q_dedup_cluster_assignment(spark, sf_dir):
    """Iterative min-label propagation (connected components) grouping the
    MinHash-LSH near-dup pairs into dedup clusters — a genuinely iterative
    DataFrame algorithm; the oracle is a recursive transitive-closure CTE.
    Serves the shared session artifact (dedup_cluster_cc)."""
    return dedup_cluster_cc(spark, sf_dir).select(
        F.col("node").alias("doc_id"), "cluster_id"
    )


@register(
    "array_funcs_suite",
    """
SELECT doc_id,
  CAST(len(toks) AS INT) AS n_tokens,
  CAST(len(list_distinct(toks)) AS INT) AS n_distinct,
  array_to_string(list_sort(list_distinct(toks))[1:3], ',') AS first3_sorted,
  list_contains(toks, 'the') AS has_the,
  CAST(list_position(toks, 'data') AS INT) AS data_pos
FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
""",
)
def q_array_funcs_suite(spark, sf_dir):
    """§2.8 array-function breadth: size/distinct/sort/slice/contains/position
    (1-based position, 0 = absent — matching both engines)."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.array_join(
            F.slice(F.array_sort(F.array_distinct(toks)), 1, 3), ","
        ).alias("first3_sorted"),
        F.array_contains(toks, "the").alias("has_the"),
        F.array_position(toks, "data").cast("int").alias("data_pos"),
    )


@register(
    "sliding_window_counts",
    """
SELECT window_start_ms, event_type, CAST(count(*) AS BIGINT) AS n FROM (
  SELECT epoch_ms(ts) - (epoch_ms(ts) % 1800000) - 1800000 AS window_start_ms,
         event_type FROM events
  UNION ALL
  SELECT epoch_ms(ts) - (epoch_ms(ts) % 1800000), event_type FROM events
) GROUP BY window_start_ms, event_type
""",
)
def q_sliding_window_counts(spark, sf_dir):
    """Sliding windows (1 h long, 30 min slide): each event lands in two
    windows — Spark's window() generator; the oracle mirrors it as a UNION
    ALL of the two half-hour-aligned starts. Batch twin of the streaming
    sliding aggregate."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window(F.col("ts"), "1 hour", "30 minutes").alias("w"), F.col("event_type")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_millis(F.col("w.start")).alias("window_start_ms"),
            "event_type",
            "n",
        )
    )


@register(
    "pivot_event_type_counts",
    """
SELECT user_id % 10 AS user_bucket,
  CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
  CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS error,
  CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
  CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS signup,
  CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view
FROM events GROUP BY 1
""",
)
def q_pivot_event_type_counts(spark, sf_dir):
    """Pivot (crosstab): event-type counts per user bucket. Explicit value
    list keeps the pivot a single pass (no distinct-values pre-scan)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy((F.col("user_id") % 10).alias("user_bucket"))
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )


@register(
    "unpivot_lineitem_metrics",
    f"""
SELECT l_orderkey, l_linenumber, metric,
  round(CAST(CAST(value AS {_DEC}) AS DOUBLE), 2) AS value
FROM (
  SELECT l_orderkey, l_linenumber, 'quantity' AS metric, l_quantity AS value FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'price', l_extendedprice FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
) WHERE l_orderkey < 100
""",
)
def q_unpivot_lineitem_metrics(spark, sf_dir):
    """Unpivot (melt): wide metric columns → long (metric, value) rows via
    stack() — one scan, no union re-reads."""
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 100)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "stack(3, 'quantity', l_quantity, 'price', l_extendedprice, "
            "'discount', l_discount) AS (metric, raw)"
        ),
    ).select(
        "l_orderkey",
        "l_linenumber",
        "metric",
        F.round(F.col("raw").cast(_DEC).cast("double"), 2).alias("value"),
    )


@register(
    "explode_token_topk",
    """
SELECT tok, CAST(count(*) AS BIGINT) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
GROUP BY tok ORDER BY n DESC, tok ASC LIMIT 20
""",
)
def q_explode_token_topk(spark, sf_dir):
    """Generator + aggregate + deterministic top-k: most frequent tokens."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("tok").asc())
        .limit(20)
    )


@register(
    "null_handling_suite",
    f"""
SELECT c_custkey,
  round(CAST(CAST(coalesce(nullif(c_acctbal, 0), -1) AS {_DEC}) AS DOUBLE), 2)
    AS bal_or_neg1,
  CASE WHEN c_acctbal < 0 THEN NULL ELSE 'ok' END AS status_or_null,
  coalesce(CASE WHEN c_acctbal < 0 THEN NULL ELSE 'ok' END, 'flagged') AS status,
  CAST(c_acctbal IS NULL AS BOOLEAN) AS bal_is_null,
  CAST((c_acctbal > 1000) IS NOT TRUE AS BOOLEAN) AS not_definitely_rich
FROM customer
""",
)
def q_null_handling_suite(spark, sf_dir):
    """Three-valued-logic breadth: nullif/coalesce/IS NULL/IS NOT TRUE."""
    c = _t(spark, sf_dir, "customer")
    status_or_null = F.when(F.col("c_acctbal") < 0, F.lit(None)).otherwise(F.lit("ok"))
    return c.select(
        "c_custkey",
        F.round(
            F.coalesce(F.nullif(F.col("c_acctbal"), F.lit(0)), F.lit(-1))
            .cast(_DEC)
            .cast("double"),
            2,
        ).alias("bal_or_neg1"),
        status_or_null.alias("status_or_null"),
        F.coalesce(status_or_null, F.lit("flagged")).alias("status"),
        F.isnull("c_acctbal").alias("bal_is_null"),
        (~F.coalesce(F.col("c_acctbal") > 1000, F.lit(False))).alias(
            "not_definitely_rich"
        ),
    )


def _corr_oracle() -> str:
    # decimal-exact component sums, then IDENTICAL double arithmetic in both
    # engines — avoids engine-specific corr()/stddev() summation orders
    sx = f"CAST(sum(CAST(l_quantity AS {_DEC})) AS DOUBLE)"
    sy = f"CAST(sum(CAST(l_extendedprice AS {_DEC})) AS DOUBLE)"
    sxx = f"CAST(sum(CAST(l_quantity AS {_D9}) * CAST(l_quantity AS {_D9})) AS DOUBLE)"
    syy = f"CAST(sum(CAST(l_extendedprice AS {_D9}) * CAST(l_extendedprice AS {_D9})) AS DOUBLE)"
    sxy = f"CAST(sum(CAST(l_quantity AS {_D9}) * CAST(l_extendedprice AS {_D9})) AS DOUBLE)"
    n = "count(*)"
    return f"""
SELECT l_returnflag,
  CAST({n} AS BIGINT) AS n,
  round(({sxy} - {sx} * {sy} / {n}) / {n}, 4) AS covar_pop,
  round(sqrt(({sxx} - {sx} * {sx} / {n}) / {n}), 6) AS stddev_pop_qty,
  -- zero-variance guard: Spark ANSI aborts double x/0 where DuckDB
  -- yields NULL; correlation is undefined there in both engines
  CASE WHEN {sxx} - {sx} * {sx} / {n} <= 0.0
        OR {syy} - {sy} * {sy} / {n} <= 0.0 THEN NULL
    ELSE round(({sxy} - {sx} * {sy} / {n})
      / (sqrt({sxx} - {sx} * {sx} / {n}) * sqrt({syy} - {sy} * {sy} / {n})), 6)
  END AS corr_qty_price
FROM lineitem GROUP BY l_returnflag
"""


@register("stats_corr_quantity_price", _corr_oracle())
def q_stats_corr_quantity_price(spark, sf_dir):
    """Statistical aggregates (covar_pop / stddev_pop / corr) assembled from
    decimal-exact component sums so both engines compute identical doubles —
    built-in corr()/stddev() aggregate in engine-specific order and are not
    hash-stable cross-engine."""
    li = _t(spark, sf_dir, "lineitem")
    q9 = F.col("l_quantity").cast(_D9)
    p9 = F.col("l_extendedprice").cast(_D9)
    sx = F.sum(_m2("l_quantity")).cast("double")
    sy = F.sum(_m2("l_extendedprice")).cast("double")
    sxx = F.sum(q9 * q9).cast("double")
    syy = F.sum(p9 * p9).cast("double")
    sxy = F.sum(q9 * p9).cast("double")
    n = F.count(F.lit(1))
    return li.groupBy("l_returnflag").agg(
        n.cast("long").alias("n"),
        F.round((sxy - sx * sy / n) / n, 4).alias("covar_pop"),
        F.round(F.sqrt((sxx - sx * sx / n) / n), 6).alias("stddev_pop_qty"),
        # zero-variance guard mirrors the oracle (ANSI aborts double x/0)
        F.when(
            (sxx - sx * sx / n > 0) & (syy - sy * sy / n > 0),
            F.round(
                (sxy - sx * sy / n)
                / (F.sqrt(sxx - sx * sx / n) * F.sqrt(syy - sy * sy / n)),
                6,
            ),
        ).alias("corr_qty_price"),
    )


@register(
    "approx_percentile_prices",
    """
SELECT p_brand, CAST(count(*) AS BIGINT) AS n, TRUE AS within_tolerance
FROM part GROUP BY 1
""",
)
def q_approx_percentile_prices(spark, sf_dir):
    """approx_percentile (rank-sketch) self-checked in-query against the
    exact quartiles (VERDICT r01 #5): the sketch's documented rank error at
    accuracy=10000 is 0.01%, so the approximate median must land within the
    exact [q25, q75] bracket with enormous margin — ``within_tolerance``
    makes the driver hash-verify that. Sketch internals differ per engine,
    so the raw approx value stays out of the compared columns; the exact
    interpolated companion is percentile_prices."""
    p = _t(spark, sf_dir, "part")
    agg = p.groupBy("p_brand").agg(
        F.percentile_approx("p_retailprice", F.lit(0.5), F.lit(10000)).alias(
            "approx_median"
        ),
        F.expr("percentile(p_retailprice, 0.25D)").alias("q25"),
        F.expr("percentile(p_retailprice, 0.75D)").alias("q75"),
        F.count(F.lit(1)).alias("n"),
    )
    within = (F.col("approx_median") >= F.col("q25")) & (
        F.col("approx_median") <= F.col("q75")
    )
    return agg.select("p_brand", "n", within.alias("within_tolerance"))


@register(
    "text_normalize",
    """
SELECT doc_id,
  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))
    AS text_norm
FROM documents
""",
)
def q_text_normalize(spark, sf_dir):
    """Corpus normalization: lowercase / strip punctuation / collapse
    whitespace (C4-style cleanup, pure column exprs)."""
    docs = _t(spark, sf_dir, "documents")
    return TXT.normalize(docs).select("doc_id", "text_norm")


def _split_oracle() -> str:
    hv = D.hex_value_sql("md5(CAST(doc_id AS VARCHAR))", 2)
    # weights train/val/test = 90/5/5 -> bounds 230, 243, 256
    return f"""
SELECT split, CAST(count(*) AS BIGINT) AS n FROM (
  SELECT CASE WHEN ({hv}) < 230 THEN 'train'
              WHEN ({hv}) < 243 THEN 'val'
              ELSE 'test' END AS split
  FROM documents
) GROUP BY split
"""


@register("dataset_split_counts", _split_oracle())
def q_dataset_split_counts(spark, sf_dir):
    """Deterministic md5-bucketed train/val/test assignment — reproducible
    across engines/partitionings, unlike random sample()."""
    docs = _t(spark, sf_dir, "documents")
    return (
        TXT.dataset_split(docs, "doc_id")
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --- perceptual-hash image dedup (round 5) --------------------------------

#: content is keyed on doc_id % factor so the synthetic corpus contains
#: real duplicate images (factor-sized groups) while media_id stays unique
_PHASH_DUP_FACTOR = 100


def _dd_phash_oracle() -> str:
    hex_chain = " || ".join(
        f"md5('m{i}:' || (doc_id % {_PHASH_DUP_FACTOR})::VARCHAR)"
        for i in range(4)
    )
    bits = " + ".join(
        f"(CASE WHEN {dd_hexbyte('h', j)} > {dd_hexbyte('h', j + 1)} "
        f"THEN {2 ** j} ELSE 0 END)"
        for j in range(15)
    )
    return f"""
WITH m AS (SELECT doc_id AS media_id, {hex_chain} AS hex FROM documents),
d AS (SELECT media_id, md5(hex) AS h FROM m),
ph AS (SELECT media_id, CAST({bits} AS BIGINT) AS phash FROM d)
SELECT phash, CAST(count(*) AS BIGINT) AS n_images,
  CAST(min(media_id) AS BIGINT) AS canonical_id
FROM ph GROUP BY phash HAVING count(*) >= 2
"""


@register("image_phash_dedup", _dd_phash_oracle())
def q_image_phash_dedup(spark, sf_dir):
    """Image near-dup detection by perceptual hash (dHash): decode the
    binary media column in Arrow batches (operators/multimodal — real PIL
    branch where a codec exists, the SQL-mirrorable md5 stub here), then
    derive a 15-bit gradient hash JVM-side (bit j = feature[j] >
    feature[j+1]; on real thumbnails this is the classic dHash, robust to
    resize/re-encode) and group equal hashes into duplicate clusters with
    the lowest media id as canonical.

    100 TB shape: decode is the unavoidable Python stage (vectorized
    Arrow batches, media bytes never shuffled); everything after it is
    codegen — the hash is pure array arithmetic and the only exchange
    carries (64-bit hash, id) pairs, never pixels or bytes. Near-dup (small
    Hamming distance) extends the same way the fuzzy tier does: band the
    hash into interleaved bit classes and verify candidates
    (operators/fuzzy.fuzzy_hamming_pairs) — exact-equality clustering is
    registered here because the stub's hashes are uniform (real corpora
    get their near-dup mass from re-encodes, which dHash maps to EQUAL
    hashes anyway)."""
    from py_datalake_move_files_spark.operators.multimodal import (
        decode_images,
        synth_media,
    )

    docs = _t(spark, sf_dir, "documents")
    media = synth_media(
        docs, "doc_id", content_key=F.col("doc_id") % _PHASH_DUP_FACTOR
    )
    decoded = decode_images(media)
    ph = decoded.select(
        "media_id",
        F.expr(
            "aggregate(sequence(0, 14), 0L, (phacc, phj) -> phacc + "
            "CASE WHEN element_at(feature, phj + 1) > element_at(feature, phj + 2) "
            "THEN shiftleft(1L, phj) ELSE 0L END)"
        ).alias("phash"),
    )
    return (
        ph.groupBy("phash")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_images"),
            F.min("media_id").cast("long").alias("canonical_id"),
        )
        .where(F.col("n_images") >= 2)
    )


# --- language-ID confusion matrix (round 5) -------------------------------


def _dd_lang_confusion_oracle() -> str:
    return f"""
WITH p AS ({_lang_oracle()}),
j AS (
  SELECT d.lang, p.pred_lang
  FROM documents d JOIN p ON d.doc_id = p.doc_id
)
SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n_docs,
  round(CAST(count(*) AS DOUBLE)
        / sum(count(*)) OVER (PARTITION BY lang), 6) AS share_of_lang
FROM j GROUP BY lang, pred_lang
"""


@register("lang_confusion_matrix", _dd_lang_confusion_oracle())
def q_lang_confusion_matrix(spark, sf_dir):
    """Weak-label audit for the language column: confusion matrix of the
    stored ``lang`` label vs the marker-token classifier's prediction,
    with each cell's share of its true-label row. Off-diagonal mass tells
    a curation pipeline which label source to distrust before
    language-conditional filtering or temperature resampling runs.

    100 TB shape: classification is the map-only lang_scores stage; the
    matrix is one aggregate over (lang, pred_lang) — a few dozen cells —
    and the row-normalizing window runs on those cells, not on documents.
    Integer counts divide once at the end, so no float-summation-order
    risk reaches the hash."""
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    cells = (
        TXT.lang_scores(docs)
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    w = Window.partitionBy("lang")
    return cells.withColumn(
        "share_of_lang",
        F.round(F.col("n_docs").cast("double") / F.sum("n_docs").over(w), 6),
    )


# --------------------------------------------------------------------------
# extension registries (import side effect: they register into QUERIES/ORACLE)
# --------------------------------------------------------------------------

from py_datalake_move_files_spark import queries_analytics  # noqa: E402,F401
from py_datalake_move_files_spark import queries_profiling  # noqa: E402,F401
from py_datalake_move_files_spark import queries_corpus  # noqa: E402,F401
from py_datalake_move_files_spark import queries_ivf  # noqa: E402,F401
from py_datalake_move_files_spark import queries_pq  # noqa: E402,F401
from py_datalake_move_files_spark import queries_tpch  # noqa: E402,F401
from py_datalake_move_files_spark import queries_scale  # noqa: E402,F401
from py_datalake_move_files_spark import queries_retrieval  # noqa: E402,F401
from py_datalake_move_files_spark import queries_knn  # noqa: E402,F401
from py_datalake_move_files_spark import queries_insights  # noqa: E402,F401
from py_datalake_move_files_spark import queries_stats  # noqa: E402,F401
from py_datalake_move_files_spark import queries_mining  # noqa: E402,F401
from py_datalake_move_files_spark import queries_pipeline  # noqa: E402,F401
from py_datalake_move_files_spark import queries_eval  # noqa: E402,F401
from py_datalake_move_files_spark import queries_audit  # noqa: E402,F401
from py_datalake_move_files_spark import queries_measure  # noqa: E402,F401


def _dd_audio_oracle() -> str:
    b = [dd_hexbyte("h", i) for i in range(4)]
    rms = ",\n  ".join(
        f"CAST({b[i]} AS DOUBLE) / 256.0 AS r{i}" for i in range(4)
    )
    return f"""
WITH m AS (
  SELECT doc_id AS media_id, {_DD_MEDIA_HEX} AS hex FROM documents
), d AS (
  SELECT media_id, md5(hex) AS h FROM m
), s AS (
  SELECT media_id,
    8000 * (1 + {b[0]} % 6) AS sample_rate,
    1 + {b[1]} % 2 AS n_channels,
    1000 + {b[2]} * 64 AS n_frames
  FROM d
)
SELECT s.media_id, 'audio/fake' AS mime,
  CAST(sample_rate AS INTEGER) AS sample_rate,
  CAST(n_channels AS INTEGER) AS n_channels,
  CAST(n_frames AS BIGINT) AS n_frames,
  CAST((n_frames * 1000) // sample_rate AS BIGINT) AS duration_ms,
  {rms}
FROM s JOIN d ON s.media_id = d.media_id
"""


@register("multimodal_audio_features", _dd_audio_oracle())
def q_multimodal_audio_features(spark, sf_dir):
    """Binary audio → Arrow-batched decode (stdlib-wave real path, md5 stub
    for non-RIFF payloads — the synthetic corpus takes the stub branch) →
    sample_rate / channels / frames / duration + RMS energy windows
    projected to driver-hashable scalars (r0..r3, exact k/256 doubles).
    The real-decode branch is covered by tests/test_multimodal with a
    crafted in-memory WAV."""
    from py_datalake_move_files_spark.operators.multimodal import (
        extract_audio_features,
        synth_media,
    )

    docs = _t(spark, sf_dir, "documents")
    media = synth_media(docs, "doc_id", mime="audio/fake")
    feats = extract_audio_features(media)
    return feats.select(
        "media_id",
        "mime",
        "sample_rate",
        "n_channels",
        "n_frames",
        "duration_ms",
        *[
            F.element_at("rms", i + 1).cast("double").alias(f"r{i}")
            for i in range(4)
        ],
    )
