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


def hyperplanes(n_planes: int, dim: int) -> list[list[int]]:
    """Deterministic ±1 hyperplanes from md5 — reproducible in any engine
    (and embedded as literals into the oracle SQL)."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"plane{p}:{d}".encode()).hexdigest()
            row.append(1 if int(h[0], 16) < 8 else -1)
        planes.append(row)
    return planes


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


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate cosine top-k: candidates limited to the query's LSH bucket.

    Same output shape as :func:`brute_force_topk`; queries whose bucket holds
    fewer than ``k`` neighbors return fewer rows (classic LSH recall trade —
    at scale you'd multi-probe or band multiple tables).
    """
    planes = hyperplanes(n_planes, dim)
    c = ensure_parallelism(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        bucket_expr(vec_col, planes).alias("bucket"),
    )
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            bucket_expr(vec_col, planes).alias("bucket"),
        )
    )
    scored = (
        c.join(q, "bucket")
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


def embedding_near_dup_pairs(
    corpus: DataFrame,
    *,
    threshold: float = 0.95,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH buckets: only vectors in
    the same bucket are compared (no all-pairs at scale); exact cosine then
    filters to ≥ threshold."""
    planes = hyperplanes(n_planes, dim)
    b = ensure_parallelism(corpus).select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        bucket_expr(vec_col, planes).alias("bucket"),
    )
    return (
        b.alias("a")
        .join(b.alias("x"), "bucket")
        .where(F.col("a.vid") < F.col("x.vid"))
        .select(
            F.col("a.vid").alias("id_a"),
            F.col("x.vid").alias("id_b"),
            F.round(cosine("a.vec", "x.vec"), 6).alias("cosine_sim"),
        )
        .where(F.col("cosine_sim") >= threshold)
    )
