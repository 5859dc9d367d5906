"""Lexical retrieval operators.

BM25 (Robertson-Spärck Jones, the TREC-era public formula) as a Spark
plan: corpus statistics (N, avgdl, one document frequency per query term)
are ONE map-side-combined aggregate producing a single row, broadcast back
onto the scoring scan; the per-document score is pure column arithmetic
inside whole-stage codegen; the global top-k plans as
TakeOrderedAndProject. ZERO hash exchanges end to end — at 100 TB the
corpus is scanned once and never shuffled (pinned in
tests/test_plans.test_bm25_scoring_scan_never_shuffles).

Cross-engine exactness: term df / tf / doc lengths are exact integer
aggregates; the only doubles are the final per-term chain, emitted as ONE
SQL text (:func:`bm25_score_sql`) that runs verbatim on Spark SQL and
DuckDB — same ln/division associativity — and is rounded to 6 dp BEFORE
ranking so a boundary tie can never rank differently across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from py_datalake_move_files_spark.functions.scaling import ensure_parallelism

BM25_K1 = 1.2
BM25_B = 0.75


def bm25_term_sql(term_idx: int, *, k1: float = BM25_K1, b: float = BM25_B) -> str:
    """One term's BM25 contribution — IDENTICAL text runs on Spark SQL and
    DuckDB (ln/round/casts shared):
    idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)), with
    idf = ln((N − df + 0.5)/(df + 0.5) + 1). Expects columns
    ``n_docs, avgdl, dl, tf{i}, df{i}`` in scope."""
    tf, df = f"tf{term_idx}", f"df{term_idx}"
    idf = f"ln((CAST(n_docs AS DOUBLE) - {df} + 0.5) / ({df} + 0.5) + 1.0)"
    return (
        f"({idf}) * (CAST({tf} AS DOUBLE) * {k1 + 1.0}) / "
        f"(CAST({tf} AS DOUBLE) + {k1} * (1.0 - {b} + {b} * "
        f"(CAST(dl AS DOUBLE) / avgdl)))"
    )


def bm25_score_sql(n_terms: int, *, k1: float = BM25_K1, b: float = BM25_B) -> str:
    """Σ over the fixed term list, left-associative in list order, rounded
    to 6 dp (ranking happens on the rounded value on both engines)."""
    chain = None
    for i in range(n_terms):
        piece = bm25_term_sql(i, k1=k1, b=b)
        chain = piece if chain is None else f"({chain}) + ({piece})"
    return f"round({chain}, 6)"


def bm25_topk(
    docs: DataFrame,
    terms: tuple[str, ...] | list[str],
    *,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Top-k documents by BM25 for a fixed bag-of-words query. Output:
    (id_col, score, rnk) — ties break on the lower document id. ``terms``
    must not contain SQL-special characters (they are embedded as string
    literals into codegen'd filter lambdas)."""
    toks = ensure_parallelism(docs).withColumn(
        "__toks", F.expr(f"split({text_col}, ' ')")
    )
    stats = toks.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        (
            F.sum(F.size("__toks").cast("long")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("avgdl"),
        *[
            F.sum(F.when(F.array_contains("__toks", t), 1).otherwise(0))
            .cast("long")
            .alias(f"df{i}")
            for i, t in enumerate(terms)
        ],
    )
    perdoc = toks.select(
        id_col,
        F.size("__toks").cast("long").alias("dl"),
        *[
            F.expr(
                f"CAST(size(filter(__toks, bmt{i} -> bmt{i} = '{t}')) AS BIGINT)"
            ).alias(f"tf{i}")
            for i, t in enumerate(terms)
        ],
    )
    scored = perdoc.crossJoin(F.broadcast(stats)).select(
        id_col, F.expr(bm25_score_sql(len(terms), k1=k1, b=b)).alias("score")
    )
    from pyspark.sql import Window

    top = scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return top.withColumn("rnk", F.row_number().over(w)).select(
        F.col(id_col).cast("long"), "score", F.col("rnk").cast("int")
    )
