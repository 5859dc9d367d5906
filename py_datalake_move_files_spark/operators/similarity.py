"""Embedding similarity search over ``array<float>`` columns.

Two tiers:

- :func:`brute_force_topk` — exact cosine top-k. The query side is tiny and
  broadcast; the corpus is never shuffled: the plan is broadcast-nested-loop
  join → per-row dot product (codegen ``zip_with``/``aggregate``, all
  JVM-side) → per-query top-k via window. At 100 TB the corpus scan is
  embarrassingly parallel and the only shuffle is the final top-k (k rows per
  partition after partial sort — Spark's TakeOrderedAndProject pattern).
- :func:`lsh_bucketed_topk` — sign-random-projection (hyperplane) LSH: each
  vector gets a ``n_planes``-bit bucket from deterministic md5-derived ±1
  hyperplanes; queries only compare against their own bucket. Recall is
  approximate; at scale the bucket join replaces the full corpus scan.

All arithmetic is double-precision, left-to-right over the array — the
DuckDB oracle reproduces it exactly (queries.py embeds the same hyperplane
constants in the SQL).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from py_datalake_move_files_spark.functions.scaling import ensure_parallelism


_UNIQ = iter(range(10**9))


def _u() -> str:
    """Unique lambda-variable suffix.

    CRITICAL: higher-order functions here are built as SQL text via
    ``F.expr`` with UNIQUE lambda variable names, never as PySpark Python
    lambdas — multiple python-lambda HOFs in one projection silently corrupt
    values (observed on Spark 4.1: colliding ``namedlambdavariable`` ids;
    see tests/test_lambda_safety.py)."""
    return str(next(_UNIQ))


def dot(a: str, b: str) -> Column:
    """Σ a[i]·b[i], double, sequential fold — args are SQL column refs."""
    u = _u()
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x{u}, y{u}) -> "
        f"CAST(x{u} AS DOUBLE) * CAST(y{u} AS DOUBLE)), 0D, "
        f"(acc{u}, v{u}) -> acc{u} + v{u})"
    )


def norm(a: str) -> Column:
    u = _u()
    return F.sqrt(
        F.expr(
            f"aggregate({a}, 0D, (acc{u}, v{u}) -> "
            f"acc{u} + CAST(v{u} AS DOUBLE) * CAST(v{u} AS DOUBLE))"
        )
    )


def cosine(a: str, b: str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    ``queries`` must have (query_id_col, vec_col). Similarity is rounded to
    6 dp for stable cross-engine comparison; ties break on neighbor id.
    Self-matches (query_id == neighbor id) are excluded.
    """
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
        )
    )
    scored = (
        ensure_parallelism(corpus)
        .select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
        .crossJoin(q)
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine("q_vec", "c_vec"), 6).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rnk")
    )


def hyperplanes(n_planes: int, dim: int, *, table: int = 0) -> list[list[int]]:
    """Deterministic ±1 hyperplanes from md5 — reproducible in any engine
    (and embedded as literals into the oracle SQL). ``table`` seeds an
    independent plane family per LSH hash table (table 0 keeps the original
    seeds, so single-table plans and their oracles are unchanged).

    Scaling guidance (100 TB): pick ``n_planes ≈ log2(N / B)`` for a corpus
    of N vectors and a target bucket size B — 8 planes = 256 buckets is a
    test-scale setting; a 10^10-vector corpus wanting ~10^4-vector buckets
    needs ~20 planes. Recall lost to finer buckets is bought back with
    ``n_tables`` (independent tables, union of candidates), the standard
    LSH recall/cost dial."""
    planes = []
    prefix = "" if table == 0 else f"t{table}:"
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{prefix}plane{p}:{d}".encode()).hexdigest()
            row.append(1 if int(h[0], 16) < 8 else -1)
        planes.append(row)
    return planes


def _cap_bucket_size(df: DataFrame, keys: list[str], max_bucket: int | None) -> DataFrame:
    """Hard guard for degenerate buckets: drop rows in buckets larger than
    ``max_bucket`` BEFORE the self/bucket join, bounding candidate counts at
    O(max_bucket²) per bucket instead of O(N²) when a corpus collapses into
    one bucket (e.g. near-constant embeddings). One window count over the
    same keys the join shuffles on — co-partitioned, no extra exchange
    pattern. AQE skew-split is the soft complement (it splits oversized
    partitions); this cap is the semantic bound. Oversized buckets should be
    handled upstream (exact dedup collapses identical payloads first)."""
    if max_bucket is None:
        return df
    w = Window.partitionBy(*[F.col(k) for k in keys])
    return (
        df.withColumn("__bucket_n", F.count(F.lit(1)).over(w))
        .where(F.col("__bucket_n") <= max_bucket)
        .drop("__bucket_n")
    )


def bucket_expr(vec_col: str, planes: list[list[int]]) -> Column:
    """LSH bucket id: bit p = sign(v · plane_p), packed into a long."""
    bits = []
    for p, row in enumerate(planes):
        consts = "array(" + ", ".join(f"{v}D" for v in row) + ")"
        u = _u()
        d = F.expr(
            f"aggregate(zip_with({vec_col}, {consts}, (x{u}, y{u}) -> "
            f"cast(x{u} as double) * y{u}), 0D, (acc{u}, v{u}) -> acc{u} + v{u})"
        )
        bits.append(F.when(d > 0, F.lit(2**p)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long")


def _multi_bucketed(
    df: DataFrame,
    out_id: str,
    out_vec: str,
    id_col: str,
    vec_col: str,
    planes_per_table: list[list[list[int]]],
) -> tuple[DataFrame, list[str]]:
    """(frame, join_keys): one pass over ``df`` computing every table's
    bucket, exploded to one row per (vector, table). Single-table stays a
    plain bucket column — identical plan to the original single-table op."""
    base = df.select(F.col(id_col).alias(out_id), F.col(vec_col).alias(out_vec))
    if len(planes_per_table) == 1:
        return (
            base.withColumn("bucket", bucket_expr(out_vec, planes_per_table[0])),
            ["bucket"],
        )
    tb = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(t).alias("tbl"),
                    bucket_expr(out_vec, planes).alias("bucket"),
                )
                for t, planes in enumerate(planes_per_table)
            ]
        )
    ).alias("tb")
    return (
        base.select(out_id, out_vec, tb).select(
            out_id, out_vec, F.col("tb.tbl").alias("tbl"), F.col("tb.bucket").alias("bucket")
        ),
        ["tbl", "bucket"],
    )


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    n_tables: int = 1,
    max_bucket: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate cosine top-k: candidates limited to the query's LSH
    bucket(s).

    Same output shape as :func:`brute_force_topk`; queries whose buckets hold
    fewer than ``k`` neighbors return fewer rows (classic LSH recall trade).
    ``n_tables`` > 1 unions candidates from independent hyperplane families
    (multi-table LSH — recall recovery; see :func:`hyperplanes` for the
    n_planes/n_tables scaling rule); the corpus is scanned ONCE and exploded
    per table, never re-read. ``max_bucket`` bounds degenerate corpus buckets
    (see :func:`_cap_bucket_size`)."""
    planes_per_table = [hyperplanes(n_planes, dim, table=t) for t in range(n_tables)]
    c, keys = _multi_bucketed(
        ensure_parallelism(corpus), "neighbor_id", "c_vec", id_col, vec_col,
        planes_per_table,
    )
    c = _cap_bucket_size(c, keys, max_bucket)
    q, _ = _multi_bucketed(queries, "query_id", "q_vec", query_id_col, vec_col,
                           planes_per_table)
    scored = (
        c.join(F.broadcast(q), keys)
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine("q_vec", "c_vec"), 6).alias("cosine_sim"),
        )
    )
    if n_tables > 1:
        # the same pair can meet in several tables — one candidate each
        scored = scored.distinct()
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rnk")
    )


def embedding_near_dup_pairs(
    corpus: DataFrame,
    *,
    threshold: float = 0.95,
    n_planes: int = 8,
    dim: int = 64,
    n_tables: int = 1,
    max_bucket: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH buckets: only vectors in
    the same bucket are compared (no all-pairs at scale); exact cosine then
    filters to ≥ threshold. ``n_tables`` unions candidates from independent
    plane families (recall); ``max_bucket`` hard-bounds degenerate buckets so
    a near-constant corpus cannot go quadratic (see :func:`_cap_bucket_size`
    — pair such corpora with exact dedup upstream)."""
    planes_per_table = [hyperplanes(n_planes, dim, table=t) for t in range(n_tables)]
    b, keys = _multi_bucketed(
        ensure_parallelism(corpus), "vid", "vec", id_col, vec_col, planes_per_table
    )
    b = _cap_bucket_size(b, keys, max_bucket)
    pairs = (
        b.alias("a")
        .join(b.alias("x"), keys)
        .where(F.col("a.vid") < F.col("x.vid"))
        .select(
            F.col("a.vid").alias("id_a"),
            F.col("x.vid").alias("id_b"),
            F.round(cosine("a.vec", "x.vec"), 6).alias("cosine_sim"),
        )
        .where(F.col("cosine_sim") >= threshold)
    )
    return pairs.distinct() if n_tables > 1 else pairs
