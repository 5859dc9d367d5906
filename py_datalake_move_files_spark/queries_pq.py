"""PQ (product-quantization) ANN queries — the compressed-corpus scale path
that completes the similarity tier (brute force / LSH / IVF / PQ).

PQ is the FAISS-style memory architecture: split each vector into ``m``
subspaces, quantize every subvector to one of ``k`` codewords, and answer
queries by ranking ADC (asymmetric-distance) sums of per-subspace
query-to-codeword distances. The encoded corpus is ``m`` bytes per vector
instead of ``dim`` floats — the compression that lets a cluster keep a
trillion-vector index resident. Here the codebook is a deterministic
md5-ordered sample (reproducible in SQL), encoding is a zero-shuffle map
stage over codeword literals, and the ADC scan reads ONLY the code column
(the float vectors are pruned from the scan), so the whole index
build + search pipeline gets an exact DuckDB oracle — distances are
fixed-point BIGINTs (x1e6), making every sum/argmin associativity-free.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from py_datalake_move_files_spark.operators import similarity as SIM
from py_datalake_move_files_spark.oracle_frags import dd_recall_tail
from py_datalake_move_files_spark.queries import (
    EMB_DIM,
    dd_cosine,
    dd_dot,
    dd_norm,
    register,
    _t,
)

K_CODES = 16
M_SUB = 8
SUBDIM = EMB_DIM // M_SUB

#: codebook cache keyed on the table snapshot (catalog.table_snapshot) —
#: training is deterministic (md5-ordered sample), so re-collecting per
#: query invocation would repeat an identical Spark job; a PQ deployment
#: trains once and reuses the codebook. The snapshot key retrains when
#: data under the same path is rewritten (ADVICE r4).
_CODEBOOK: dict[tuple, list[list[float]]] = {}


def _codebook(spark, sf_dir: str) -> list[list[float]]:
    from py_datalake_move_files_spark.catalog import table_snapshot

    key = table_snapshot(sf_dir, "embeddings")
    if key not in _CODEBOOK:
        _CODEBOOK[key] = SIM.pq_codebook(
            _t(spark, sf_dir, "embeddings"), k=K_CODES
        )
    return _CODEBOOK[key]


def _dd_subdist(a: str, b: str, j: int) -> str:
    """DuckDB fixed-point squared L2 over subspace ``j`` — the same
    left-associative chain :func:`SIM.pq_subdist_sql` emits on the Spark
    side (1-based list indexing on both engines)."""
    terms = []
    for i in range(SUBDIM):
        idx = j * SUBDIM + i + 1
        d = f"(CAST({a}[{idx}] AS DOUBLE) - CAST({b}[{idx}] AS DOUBLE))"
        terms.append(f"{d} * {d}")
    chain = terms[0]
    for t in terms[1:]:
        chain = f"({chain} + {t})"
    return f"CAST(round(({chain}) * 1000000) AS BIGINT)"


def _pq_prelude() -> str:
    """cb (code id = md5 rank - 1) -> per-(vector, codeword) subspace
    distances -> argmin codes: one row per (vec_id, subspace)."""
    dcols = ",\n    ".join(
        f"{_dd_subdist('e.embedding', 'c.cv', j)} AS d{j}" for j in range(M_SUB)
    )
    unions = "\n  UNION ALL ".join(
        f"SELECT vec_id, c, {j} AS j, d{j} AS d FROM ec" for j in range(M_SUB)
    )
    return f"""
WITH cb AS (
  SELECT rn - 1 AS c, cv FROM (
    SELECT embedding AS cv,
           row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
    FROM embeddings
  ) WHERE rn <= {K_CODES}
),
ec AS (
  SELECT e.vec_id, c.c,
    {dcols}
  FROM embeddings e CROSS JOIN cb c
),
lj AS (
  {unions}
),
codes AS (
  SELECT vec_id, j, c AS code FROM (
    SELECT *, row_number() OVER (
      PARTITION BY vec_id, j ORDER BY d ASC, c ASC) AS rn
    FROM lj
  ) WHERE rn = 1
)
"""


_ADC_TAIL = f""",
qv AS (SELECT vec_id AS query_id, embedding AS q_vec FROM embeddings WHERE vec_id < 5),
adc AS (
  SELECT q.query_id, cd.vec_id AS neighbor_id,
    SUM(CASE cd.j {' '.join(f'WHEN {j} THEN ' + _dd_subdist('q.q_vec', 'c.cv', j) for j in range(M_SUB))} END) AS di
  FROM codes cd JOIN cb c ON cd.code = c.c CROSS JOIN qv q
  WHERE cd.vec_id <> q.query_id
  GROUP BY q.query_id, cd.vec_id
),
pq_r AS (
  SELECT query_id, neighbor_id,
         round(CAST(di AS DOUBLE) / 1000000.0, 6) AS approx_dist,
         row_number() OVER (
           PARTITION BY query_id ORDER BY di ASC, neighbor_id ASC) AS rn
  FROM adc
)"""


@register(
    "pq_code_histogram",
    _pq_prelude()
    + """
SELECT CAST(j AS INT) AS subspace, CAST(code AS INT) AS code,
       CAST(count(*) AS BIGINT) AS n_vectors
FROM codes GROUP BY j, code
""",
)
def q_pq_code_histogram(spark, sf_dir):
    """PQ index build check: vectors per (subspace, codeword). Codeword
    utilization balance is THE operational metric for a product quantizer
    (dead codewords waste bits, hot ones blur distances); the encode stage
    itself is shuffle-free — the only exchange here belongs to this
    m·k-group aggregate."""
    emb = _t(spark, sf_dir, "embeddings")
    enc = SIM.pq_encode(emb, _codebook(spark, sf_dir), m=M_SUB)
    return (
        enc.select(
            F.posexplode("codes").alias("subspace", "__code")
        )
        .select("subspace", F.col("__code").cast("int").alias("code"))
        .groupBy("subspace", "code")
        .agg(F.count(F.lit(1)).cast("long").alias("n_vectors"))
    )


@register(
    "ann_pq_topk",
    _pq_prelude()
    + _ADC_TAIL
    + """
SELECT query_id, neighbor_id, approx_dist, CAST(rn AS INT) AS rnk
FROM pq_r WHERE rn <= 10
""",
)
def q_ann_pq_topk(spark, sf_dir):
    """PQ ADC search: same query set and output shape as the other three
    similarity paths (brute force / LSH / IVF), ranking by the compressed
    approximate distance. The scan reads the 8-int code column only — the
    full-precision vectors never leave the index build."""
    emb = _t(spark, sf_dir, "embeddings")
    cb = _codebook(spark, sf_dir)
    enc = SIM.pq_encode(emb, cb, m=M_SUB)
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return SIM.pq_adc_topk(enc, queries, cb, k=10, m=M_SUB)


@register(
    "ann_recall_pq",
    _pq_prelude()
    + _ADC_TAIL
    + dd_recall_tail("pq_r"),
)
def q_ann_recall_pq(spark, sf_dir):
    """Recall@10 of the PQ index against the exact brute-force baseline —
    the eval that quantifies what the 32x compression costs in neighbor
    quality (PQ approximates distances, so recall trails IVF's, which
    scans full-precision vectors; at 100 TB you buy it back with
    IVF+PQ composition and re-ranking survivors at full precision).
    Both arms deterministic, so the evaluation is exactly oracle-checked;
    evaluation cost is dominated by the exact arm, run on a query sample."""
    emb = _t(spark, sf_dir, "embeddings")
    cb = _codebook(spark, sf_dir)
    enc = SIM.pq_encode(emb, cb, m=M_SUB)
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    pq = SIM.pq_adc_topk(enc, queries, cb, k=10, m=M_SUB)
    exact = SIM.brute_force_topk(emb, queries, k=10)
    return SIM.recall_vs_exact(pq, exact, queries, k=10)


# --- IVF+PQ composed search with exact re-ranking -------------------------

_RERANK = 20


def _ivfpq_ctes() -> str:
    from py_datalake_move_files_spark.oracle_ivf import (
        IVF_PRELUDE as _IVF_PRELUDE,
        N_PROBE,
    )

    # merge the IVF prelude (c/sc/asg) with the PQ prelude (cb/ec/lj/codes):
    # strip the PQ prelude's leading WITH and chain the CTE lists
    pq_ctes = _pq_prelude().strip()
    assert pq_ctes.startswith("WITH ")
    adc_case = " ".join(
        f"WHEN {j} THEN " + _dd_subdist("q.q_vec", "c.cv", j)
        for j in range(M_SUB)
    )
    return (
        _IVF_PRELUDE
        + ",\n"
        + pq_ctes[len("WITH ") :]
        + f""",
probes AS (
  SELECT vec_id AS query_id, cid AS list_id FROM (
    SELECT *, row_number() OVER (
      PARTITION BY vec_id ORDER BY s DESC, cid ASC) AS rn
    FROM sc WHERE vec_id < 5
  ) WHERE rn <= {N_PROBE}
),
qv AS (SELECT vec_id AS query_id, embedding AS q_vec FROM embeddings WHERE vec_id < 5),
candv AS (
  SELECT p.query_id, a.vec_id AS neighbor_id
  FROM probes p JOIN asg a USING (list_id)
  WHERE a.vec_id <> p.query_id
),
adc2 AS (
  SELECT c2.query_id, c2.neighbor_id,
    SUM(CASE cd.j {adc_case} END) AS di
  FROM candv c2
  JOIN codes cd ON cd.vec_id = c2.neighbor_id
  JOIN cb c ON cd.code = c.c
  JOIN qv q ON q.query_id = c2.query_id
  GROUP BY c2.query_id, c2.neighbor_id
),
a_r AS (
  SELECT query_id, neighbor_id, row_number() OVER (
    PARTITION BY query_id ORDER BY di ASC, neighbor_id ASC) AS rn
  FROM adc2
),
rr AS (
  SELECT a2.query_id, a2.neighbor_id,
    {dd_cosine('q.q_vec', 'e.embedding')} AS cosine_sim
  FROM a_r a2
  JOIN embeddings e ON e.vec_id = a2.neighbor_id
  JOIN qv q ON q.query_id = a2.query_id
  WHERE a2.rn <= {_RERANK}
),
fin AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id ASC) AS rn
  FROM rr
)
"""
    )


def _ivfpq_oracle() -> str:
    return (
        _ivfpq_ctes()
        + """
SELECT query_id, neighbor_id, cosine_sim, CAST(rn AS INT) AS rnk
FROM fin WHERE rn <= 10
"""
    )


@register("ann_ivfpq_topk", _ivfpq_oracle())
def q_ann_ivfpq_topk(spark, sf_dir):
    """The composed FAISS-style serving path — IVF routing, compressed ADC
    scan, exact re-rank of the top survivors — as ONE Spark plan with an
    exact DuckDB oracle (operators/similarity.ivfpq_topk). Same query set
    and output shape as the other ANN paths: diff against ann_brute_force
    for end-to-end recall, against ann_pq_topk for what re-ranking buys."""
    from py_datalake_move_files_spark.queries_ivf import N_PROBE, _centroids

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return SIM.ivfpq_topk(
        emb,
        queries,
        _centroids(spark, sf_dir),
        _codebook(spark, sf_dir),
        k=10,
        rerank=_RERANK,
        n_probe=N_PROBE,
        m=M_SUB,
    )


@register(
    "ann_recall_ivfpq",
    _ivfpq_ctes()
    + dd_recall_tail("fin"),
)
def q_ann_recall_ivfpq(spark, sf_dir):
    """Recall@10 of the COMPOSED IVF+PQ+rerank path vs the exact baseline —
    read alongside ann_recall_ivf (routing-only loss) and ann_recall_pq
    (compression-only loss): within the probed lists, exact re-ranking
    recovers everything ADC approximation costs, so this metric equals
    IVF's whenever the true neighbors survive the top-``rerank`` ADC cut.
    That separation (routing loss vs compression loss vs rerank budget) is
    exactly how a production ANN deployment tunes n_probe / m / rerank."""
    from py_datalake_move_files_spark.queries_ivf import N_PROBE, _centroids

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    composed = SIM.ivfpq_topk(
        emb,
        queries,
        _centroids(spark, sf_dir),
        _codebook(spark, sf_dir),
        k=10,
        rerank=_RERANK,
        n_probe=N_PROBE,
        m=M_SUB,
    )
    exact = SIM.brute_force_topk(emb, queries, k=10)
    return SIM.recall_vs_exact(composed, exact, queries, k=10)


# --- hard-negative mining for contrastive training ------------------------

_HARDNEG_ORACLE = f"""
WITH qv AS (
  SELECT vec_id AS query_id, embedding AS q_vec, label AS q_label
  FROM embeddings WHERE vec_id < 5
),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id, e.label AS neg_label,
    {dd_cosine('q.q_vec', 'e.embedding')} AS cosine_sim
  FROM qv q CROSS JOIN embeddings e
  WHERE e.vec_id <> q.query_id AND e.label <> q.q_label
),
r AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id ASC) AS rn
  FROM scored
)
SELECT query_id, neighbor_id, CAST(neg_label AS INT) AS neg_label,
       cosine_sim, CAST(rn AS INT) AS rnk
FROM r WHERE rn <= 10
"""


@register("hard_negative_mining", _HARDNEG_ORACLE)
def q_hard_negative_mining(spark, sf_dir):
    """Hard-negative mining for contrastive training: for each anchor, the
    top-10 most-similar vectors with a DIFFERENT label — the negatives
    that actually move an embedding model (random negatives are too easy).
    The whole pipeline DELEGATES to brute_force_topk (ADVICE r4): the
    label-disagreement test rides the operator's pair_predicate hook so it
    applies BEFORE the top-k window (ranks are over true negatives only),
    and the negative's label is carried via corpus_extra — tie-break or
    rounding changes can never desynchronize mining from search. At 100 TB
    the mining scan swaps in the IVF/PQ index exactly like the search
    path — the filter composes with any of the four ANN strategies."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding", "label"
    )
    return SIM.brute_force_topk(
        emb,
        queries,
        k=10,
        corpus_extra={"neg_label": F.col("label").cast("int")},
        query_extra={"q_label": "label"},
        pair_predicate=F.col("neg_label") != F.col("q_label"),
        extra_out=["neg_label"],
    )


# --- int8 scalar-quantized (SQ8) ANN with exact re-ranking ----------------

_SQ_RERANK = 20


def _sq_prelude() -> str:
    """Shared SQ oracle CTEs: encode (per-vector scale cancels out of
    cosine, so only the int codes matter), asymmetric scan, top-rerank
    survivors, full-precision re-rank — mirrors similarity.sq_topk
    stage for stage."""
    return f"""
WITH sqm AS (
  SELECT vec_id, embedding,
    list_reduce(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))),
                (a, b) -> CASE WHEN b > a THEN b ELSE a END) AS mx
  FROM embeddings
),
sqe AS (
  SELECT vec_id,
    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) /
      (CASE WHEN mx = 0 THEN 1.0 ELSE mx / 127.0 END)) AS INT)) AS codes
  FROM sqm
),
qv AS (SELECT vec_id AS query_id, embedding AS q_vec FROM embeddings WHERE vec_id < 5),
sq_scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
    round(({dd_dot('q.q_vec', 'e.codes')}) /
          (({dd_norm('q.q_vec')}) * ({dd_norm('e.codes')})), 6) AS approx_sim
  FROM qv q CROSS JOIN sqe e WHERE e.vec_id <> q.query_id
),
sq_surv AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY approx_sim DESC, neighbor_id ASC) AS rn
    FROM sq_scored
  ) WHERE rn <= {_SQ_RERANK}
),
sq_rr AS (
  SELECT s.query_id, s.neighbor_id,
    {dd_cosine('q.q_vec', 'e.embedding')} AS cosine_sim
  FROM sq_surv s
  JOIN embeddings e ON e.vec_id = s.neighbor_id
  JOIN qv q ON q.query_id = s.query_id
),
sq_final AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id ASC) AS rn
  FROM sq_rr
)"""


@register(
    "ann_sq_topk",
    _sq_prelude()
    + """
SELECT query_id, neighbor_id, cosine_sim, CAST(rn AS INT) AS rnk
FROM sq_final WHERE rn <= 10
""",
)
def q_ann_sq_topk(spark, sf_dir):
    """Scalar-quantized (int8) ANN with exact re-ranking — the serving
    path that completes the compression spectrum beside PQ: SQ keeps
    per-dimension resolution at 1 byte (4x smaller scans, near-exact
    ranking), PQ compresses to ~1 bit/dim (32x, coarser). The asymmetric
    scan scores float queries directly against the integer codes (the
    per-vector scale cancels in cosine — similarity.sq_encode), so a
    persisted SQ index never ships scales to the scanner. Same query set
    and output shape as the other ANN paths."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return SIM.sq_topk(emb, queries, k=10, rerank=_SQ_RERANK)


@register(
    "ann_recall_sq",
    _sq_prelude()
    + dd_recall_tail("sq_final"),
)
def q_ann_recall_sq(spark, sf_dir):
    """Recall@10 of the SQ8 path vs the exact baseline — read alongside
    ann_recall_pq: int8 keeps every dimension so its approximate ranking
    is nearly exact and the top-rerank cut recovers the rest, which is
    why serving stacks default to SQ until memory forces PQ. Both arms
    deterministic → exact oracle."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    sq = SIM.sq_topk(emb, queries, k=10, rerank=_SQ_RERANK)
    exact = SIM.brute_force_topk(emb, queries, k=10)
    return SIM.recall_vs_exact(sq, exact, queries, k=10)


# --- exact label-stratified split over the embedding corpus ---------------

_STRAT_ORACLE = """
WITH r AS (
  SELECT label,
    row_number() OVER (
      PARTITION BY label ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rk,
    count(*) OVER (PARTITION BY label) AS n
  FROM embeddings
),
s AS (
  SELECT label,
    CASE WHEN rk <= (n * 8 + 9) // 10 THEN 'train'
         WHEN rk <= (n * 9 + 9) // 10 THEN 'val'
         ELSE 'test' END AS split
  FROM r
)
SELECT CAST(label AS INT) AS label, split, CAST(count(*) AS BIGINT) AS n_vectors
FROM s GROUP BY label, split
"""


@register("stratified_split_counts", _STRAT_ORACLE)
def q_stratified_split_counts(spark, sf_dir):
    """Exact label-stratified train/val/test allocation over the embedding
    corpus (8/1/1) — every label lands within one row of its target
    proportion via md5-ranked slicing, the guarantee an imbalanced-label
    eval needs and hash-bucket splits give only in expectation
    (operators/text.stratified_split). One exchange on the label key."""
    from py_datalake_move_files_spark.operators.text import stratified_split

    emb = _t(spark, sf_dir, "embeddings")
    s = stratified_split(emb, "vec_id", "label")
    return s.groupBy(F.col("label").cast("int").alias("label"), "split").agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors")
    )
