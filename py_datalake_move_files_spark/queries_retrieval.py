"""Retrieval + containment-dedup tier (round 5).

Three LLM-pipeline capabilities the corpus tier did not yet cover:

- ``bm25_doc_retrieval`` — lexical BM25 top-k retrieval, the classic RAG /
  data-curation ranking primitive (Robertson-Spärck Jones; the formula is
  public knowledge from the TREC literature). Corpus statistics (N, avgdl,
  per-term df) are ONE tiny aggregate broadcast to the scoring scan, so
  the plan is scan → map-side score → TakeOrderedAndProject: no shuffle
  touches the corpus at 100 TB.
- ``containment_dup_pairs`` — asymmetric shingle containment
  (|A∩B|/min(|A|,|B|)): catches a small doc embedded in a big one, which
  symmetric Jaccard misses (J≈|A|/|B|→0). operators/dedup.containment_pairs.
- ``repeated_ngram_spans`` — cross-document repeated token windows, the
  signal behind exact-substring training-data dedup (Lee et al. 2022,
  "Deduplicating Training Data Makes Language Models Better"): hash every
  W-token window (stride S), group by digest, report spans seen in ≥2
  docs. The shuffle carries 16-byte digests, never text.

All three have exact DuckDB oracles (integer counts, or double chains
mirrored op-for-op with terminal 6-dp rounding).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from py_datalake_move_files_spark.functions.scaling import ensure_parallelism
from py_datalake_move_files_spark.operators import dedup as DD
from py_datalake_move_files_spark.queries import dd_shingles, register, _t

# --- BM25 ------------------------------------------------------------------

from py_datalake_move_files_spark.operators.retrieval import (  # noqa: E402
    bm25_score_sql,
    bm25_topk,
)

#: fixed query — terms chosen from the harness corpus vocabulary; scoring
#: sums per-term contributions in THIS list order (left-associative), and
#: the oracle mirrors the same chain (operators/retrieval.bm25_score_sql
#: is shared between the Spark plan and the DuckDB SQL), so the double
#: arithmetic is bit-identical across engines
BM25_TERMS = ("spark", "merge", "vector")
BM25_TOPK = 10


_BM25_STATS_DD = ", ".join(
    f"CAST(sum(CASE WHEN list_contains(string_split(text, ' '), '{t}') "
    f"THEN 1 ELSE 0 END) AS BIGINT) AS df{i}"
    for i, t in enumerate(BM25_TERMS)
)

_BM25_TF_DD = ", ".join(
    f"CAST(len(list_filter(string_split(text, ' '), bmt{i} -> bmt{i} = '{t}')) "
    f"AS BIGINT) AS tf{i}"
    for i, t in enumerate(BM25_TERMS)
)

_BM25_ORACLE = f"""
WITH stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(string_split(text, ' '))) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS avgdl,
         {_BM25_STATS_DD}
  FROM documents
),
perdoc AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
         {_BM25_TF_DD}
  FROM documents
),
scored AS (
  SELECT d.doc_id, {bm25_score_sql(len(BM25_TERMS))} AS score
  FROM perdoc d CROSS JOIN stats
),
r AS (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rn
  FROM scored
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, score, CAST(rn AS INT) AS rnk
FROM r WHERE rn <= {BM25_TOPK}
"""


@register("bm25_doc_retrieval", _BM25_ORACLE)
def q_bm25_doc_retrieval(spark, sf_dir):
    """BM25 top-k lexical retrieval for a fixed query over `documents` —
    the ranking primitive a RAG pipeline or a quality-curation
    "relevance to seed corpus" filter runs at scale.

    100 TB shape: corpus statistics (N, avgdl, one df per query term) are
    ONE map-side-combined aggregate producing a single row, broadcast back
    onto the scoring scan (BroadcastNestedLoopJoin of 1 row — free); the
    score itself is pure per-row column arithmetic inside codegen, and the
    global top-k plans as TakeOrderedAndProject (k rows per partition
    shuffle, never a full sort). Scores are double chains mirrored
    op-for-op in the oracle (same ln/division order), rounded to 6 dp
    BEFORE ranking so the cross-engine rank can never flip on a boundary.
    Delegates to operators/retrieval.bm25_topk — the library surface a
    consumer calls directly.
    """
    return bm25_topk(_t(spark, sf_dir, "documents"), BM25_TERMS, k=BM25_TOPK)


# --- shingle containment ---------------------------------------------------

_CONTAIN_T = 0.8
#: Hot-shingle df cap (VERDICT r5 #2): shingles in more than this many
#: documents are excluded from CANDIDATE GENERATION (bounds the posting
#: self-join at Σ min(df, cap)² instead of Σ df²); surviving pairs are
#: re-scored EXACTLY over full shingle sets. The oracle applies the
#: identical cap — the SemDeDup-fix template.
_CONTAIN_DF_CAP = 64

_CONTAIN_ORACLE = f"""
WITH s AS (SELECT doc_id, {dd_shingles('text')} AS ss FROM documents),
inv AS (SELECT doc_id, unnest(ss) AS sh FROM s),
dfc AS (SELECT sh, count(*) AS d FROM inv GROUP BY sh),
fi AS (
  SELECT i.doc_id, i.sh FROM inv i JOIN dfc USING (sh)
  WHERE dfc.d > 1 AND dfc.d <= {_CONTAIN_DF_CAP}
),
hot AS (
  SELECT i.doc_id, i.sh FROM inv i JOIN dfc USING (sh)
  WHERE dfc.d > {_CONTAIN_DF_CAP}
),
hs AS (SELECT doc_id, list(sh) AS hsh FROM hot GROUP BY doc_id),
pi AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS ic
  FROM fi a JOIN fi b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
wi AS (
  SELECT id_a, id_b,
    ic + (CASE WHEN ha.hsh IS NOT NULL AND hb.hsh IS NOT NULL
               THEN len(list_intersect(ha.hsh, hb.hsh)) ELSE 0 END) AS inter
  FROM pi
  LEFT JOIN hs ha ON ha.doc_id = pi.id_a
  LEFT JOIN hs hb ON hb.doc_id = pi.id_b
),
sz AS (SELECT doc_id, len(ss) AS n FROM s),
sc AS (
  SELECT id_a, id_b,
    round(CAST(inter AS DOUBLE) / CAST(least(na.n, nb.n) AS DOUBLE), 6)
      AS containment,
    round(CAST(inter AS DOUBLE) / CAST(na.n + nb.n - inter AS DOUBLE), 6)
      AS jaccard
  FROM wi
  JOIN sz na ON na.doc_id = wi.id_a
  JOIN sz nb ON nb.doc_id = wi.id_b
)
SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
       containment, jaccard
FROM sc WHERE containment >= {_CONTAIN_T}
"""


@register("containment_dup_pairs", _CONTAIN_ORACLE)
def q_containment_dup_pairs(spark, sf_dir):
    """Asymmetric containment dedup over `documents`: pairs where the
    smaller doc's shingles are ≥80% inside the larger's — quotation /
    boilerplate / superset-page duplication that symmetric Jaccard
    structurally under-scores (operators/dedup.containment_pairs has the
    plan story; Jaccard rides along for the policy split). Candidate
    generation is df-capped at {_CONTAIN_DF_CAP} (hot-shingle guard —
    one boilerplate shingle shared by N docs no longer yields N²
    candidates); scores stay exact via full-set array_intersect, and the
    oracle applies the identical cap."""
    docs = _t(spark, sf_dir, "documents")
    out = DD.containment_pairs(
        docs, "doc_id", "text", threshold=_CONTAIN_T, max_df=_CONTAIN_DF_CAP
    )
    return out.select(
        F.col("id_a").cast("long"),
        F.col("id_b").cast("long"),
        "containment",
        "jaccard",
    )


# --- repeated cross-document token windows ---------------------------------

SPAN_W = 8
SPAN_STRIDE = 4

_SPAN_ORACLE = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
s AS (
  SELECT doc_id, unnest(
    CASE WHEN len(toks) < {SPAN_W} THEN CAST([] AS VARCHAR[])
         ELSE list_transform(
           range(0, len(toks) - {SPAN_W} + 1, {SPAN_STRIDE}),
           spi -> md5(array_to_string(toks[spi + 1 : spi + {SPAN_W}], ' ')))
    END) AS span_hash
  FROM t
)
SELECT span_hash,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_occurrences,
       CAST(min(doc_id) AS BIGINT) AS first_doc
FROM s GROUP BY span_hash HAVING count(DISTINCT doc_id) >= 2
"""


@register("repeated_ngram_spans", _SPAN_ORACLE)
def q_repeated_ngram_spans(spark, sf_dir):
    """Cross-document repeated token windows — the candidate generator for
    exact-substring dedup (Lee et al. 2022): any {SPAN_W}-token window
    (stride {SPAN_STRIDE}) occurring in ≥2 documents is memorization /
    boilerplate risk a pretraining pipeline cuts or down-weights.

    100 TB shape: windowing is a zero-shuffle map stage (tokens
    materialized ONCE as a column, windows hashed per row); both
    exchanges (the count-distinct pre-aggregate and the final group) key
    on 16-byte md5 digests — document text never shuffles.
    Stride trades recall for a ~W/stride reduction in exploded rows; a
    suffix-array pass over flagged docs is the exact-offsets follow-up a
    dedicated job would run."""
    docs = ensure_parallelism(_t(spark, sf_dir, "documents"))
    toks = docs.withColumn("__toks", F.expr("split(text, ' ')"))
    spans = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                f"CASE WHEN size(__toks) < {SPAN_W} THEN array() "
                f"ELSE transform(sequence(0, size(__toks) - {SPAN_W}, {SPAN_STRIDE}), "
                f"spi -> md5(array_join(slice(__toks, spi + 1, {SPAN_W}), ' '))) END"
            )
        ).alias("span_hash"),
    )
    return (
        spans.groupBy("span_hash")
        .agg(
            F.count_distinct("doc_id").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.min("doc_id").cast("long").alias("first_doc"),
        )
        .where(F.col("n_docs") >= 2)
    )


# --- duplicated-span coverage (round 5) ------------------------------------

_COV_ORACLE = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
sz AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM t),
s AS (
  SELECT doc_id, unnest(
    CASE WHEN len(toks) < {SPAN_W} THEN []
         ELSE list_transform(
           range(0, len(toks) - {SPAN_W} + 1, {SPAN_STRIDE}),
           spi -> {{'st': spi,
                    'h': md5(array_to_string(toks[spi + 1 : spi + {SPAN_W}], ' '))}})
    END) AS sp
  FROM t
),
sp2 AS (SELECT doc_id, sp.st AS st, sp.h AS h FROM s),
dup AS (
  SELECT h FROM (
    SELECT h, count(DISTINCT doc_id) AS nd FROM sp2 GROUP BY h
  ) WHERE nd >= 2
),
pos AS (
  SELECT DISTINCT f.doc_id, p
  FROM (SELECT sp2.doc_id, sp2.st FROM sp2 JOIN dup USING (h)) f,
       unnest(range(f.st, f.st + {SPAN_W})) AS u(p)
),
cov AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS covered_tokens FROM pos GROUP BY doc_id)
SELECT c.doc_id, z.n_tokens, c.covered_tokens,
  round(CAST(c.covered_tokens AS DOUBLE) / z.n_tokens, 6) AS dup_coverage
FROM cov c JOIN sz z ON z.doc_id = c.doc_id
"""


@register("duplicated_span_coverage", _COV_ORACLE)
def q_duplicated_span_coverage(spark, sf_dir):
    """Per-document duplicated-content fraction: the share of each doc's
    token positions covered by a cross-document repeated {SPAN_W}-token
    window (stride {SPAN_STRIDE}) — the doc-level policy signal that
    `repeated_ngram_spans`' corpus-level candidates feed. RefinedWeb-style
    pipelines drop docs above a coverage threshold and keep low-coverage
    docs with the duplicated spans masked or down-weighted.

    100 TB shape: span hashing stays the zero-shuffle map stage; the
    flagged-hash set is derived by a digest-keyed aggregate and rejoined
    on the digest (co-partitioned — the same key both exchanges already
    carry); position expansion explodes W ints per FLAGGED span only, and
    the coverage union is a distinct over (doc_id, position) int pairs —
    document text never shuffles at any stage."""
    docs = ensure_parallelism(_t(spark, sf_dir, "documents"))
    toks = docs.withColumn("__toks", F.expr("split(text, ' ')"))
    sizes = toks.select(
        "doc_id", F.size("__toks").cast("long").alias("n_tokens")
    )
    spans = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                f"CASE WHEN size(__toks) < {SPAN_W} THEN array() "
                f"ELSE transform(sequence(0, size(__toks) - {SPAN_W}, {SPAN_STRIDE}), "
                f"cvi -> struct(cvi AS st, "
                f"md5(array_join(slice(__toks, cvi + 1, {SPAN_W}), ' ')) AS h)) END"
            )
        ).alias("sp"),
    ).select("doc_id", F.col("sp.st").alias("st"), F.col("sp.h").alias("h"))
    dup = (
        spans.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("__nd"))
        .where(F.col("__nd") >= 2)
        .select("h")
    )
    pos = (
        spans.join(dup, "h")
        .select(
            "doc_id",
            F.explode(
                F.expr(f"sequence(st, st + {SPAN_W - 1})")
            ).alias("p"),
        )
        .distinct()
    )
    cov = pos.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("covered_tokens")
    )
    return cov.join(sizes, "doc_id").select(
        "doc_id",
        "n_tokens",
        "covered_tokens",
        F.round(
            F.col("covered_tokens").cast("double") / F.col("n_tokens"), 6
        ).alias("dup_coverage"),
    )


# --- hybrid retrieval: reciprocal-rank fusion of BM25 + dense cosine -------

#: RRF smoothing constant (Cormack et al. 2009, "Reciprocal Rank Fusion
#: outperforms Condorcet..."); 60 is the published default
_RRF_K = 60
_RRF_QUERY_VEC = 0  # query vector id; doc ids and vec ids are aligned


def _rrf_oracle() -> str:
    from py_datalake_move_files_spark.oracle_frags import dd_cosine

    return f"""
WITH stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(string_split(text, ' '))) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS avgdl,
         {_BM25_STATS_DD}
  FROM documents
),
perdoc AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
         {_BM25_TF_DD}
  FROM documents
),
lexs AS (
  SELECT d.doc_id, {bm25_score_sql(len(BM25_TERMS))} AS score
  FROM perdoc d CROSS JOIN stats
),
lex AS (
  SELECT doc_id, CAST(rn AS INT) AS lex_rank FROM (
    SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rn
    FROM lexs
  ) WHERE rn <= {BM25_TOPK}
),
qv AS (SELECT embedding AS q_vec FROM embeddings WHERE vec_id = {_RRF_QUERY_VEC}),
sems AS (
  SELECT c.vec_id AS doc_id, {dd_cosine('q.q_vec', 'c.embedding')} AS cs
  FROM embeddings c CROSS JOIN qv q WHERE c.vec_id <> {_RRF_QUERY_VEC}
),
sem AS (
  SELECT doc_id, CAST(rn AS INT) AS sem_rank FROM (
    SELECT doc_id, row_number() OVER (ORDER BY cs DESC, doc_id ASC) AS rn
    FROM sems
  ) WHERE rn <= {BM25_TOPK}
),
fused AS (
  SELECT coalesce(l.doc_id, s.doc_id) AS doc_id, l.lex_rank, s.sem_rank,
    CAST(coalesce(1000000 // ({_RRF_K} + l.lex_rank), 0)
       + coalesce(1000000 // ({_RRF_K} + s.sem_rank), 0) AS BIGINT) AS rrf_ppm
  FROM lex l FULL OUTER JOIN sem s ON l.doc_id = s.doc_id
)
SELECT doc_id, lex_rank, sem_rank, rrf_ppm,
  CAST(row_number() OVER (ORDER BY rrf_ppm DESC, doc_id ASC) AS INT)
    AS fused_rank
FROM fused
"""


@register("hybrid_rrf_retrieval", _rrf_oracle())
def q_hybrid_rrf_retrieval(spark, sf_dir):
    """Hybrid search: fuse the lexical BM25 top-k and the dense-cosine
    top-k for one request via reciprocal-rank fusion — the
    production-standard way to combine keyword and embedding retrieval
    without calibrating their incomparable score scales (RRF needs only
    the RANKS, which both arms define deterministically here).

    Each arm is the already-proven serving shape (BM25: broadcast
    one-row stats + map-side score + TakeOrderedAndProject; dense: the
    exact scan that swaps for the IVF/PQ index at scale), so the fusion
    stage only ever joins two k-row tables — a full-outer join on doc_id
    over <=2k rows regardless of corpus size. The RRF score
    ``sum(1/(60+rank))`` is computed in integer parts-per-million (floor
    division) so no float sum order reaches the hash; the fused rank
    breaks ppm ties on doc_id."""
    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    from py_datalake_move_files_spark.operators import similarity as SIM
    from pyspark.sql import Window

    lex = bm25_topk(docs, BM25_TERMS, k=BM25_TOPK).select(
        "doc_id", F.col("rnk").alias("lex_rank")
    )
    queries = emb.where(F.col("vec_id") == _RRF_QUERY_VEC).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    sem = SIM.brute_force_topk(emb, queries, k=BM25_TOPK).select(
        F.col("neighbor_id").alias("doc_id"), F.col("rnk").alias("sem_rank")
    )
    fused = (
        lex.withColumnRenamed("doc_id", "l_id")
        .join(
            sem.withColumnRenamed("doc_id", "s_id"),
            F.col("l_id") == F.col("s_id"),
            "full_outer",
        )
        .select(
            F.coalesce(F.col("l_id"), F.col("s_id")).alias("doc_id"),
            "lex_rank",
            "sem_rank",
            (
                F.coalesce(
                    F.expr(f"CAST(1000000 div ({_RRF_K} + lex_rank) AS BIGINT)"),
                    F.lit(0).cast("long"),
                )
                + F.coalesce(
                    F.expr(f"CAST(1000000 div ({_RRF_K} + sem_rank) AS BIGINT)"),
                    F.lit(0).cast("long"),
                )
            ).alias("rrf_ppm"),
        )
    )
    w = Window.orderBy(F.col("rrf_ppm").desc(), F.col("doc_id").asc())
    return fused.withColumn("fused_rank", F.row_number().over(w))
