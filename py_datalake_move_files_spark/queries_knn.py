"""kNN-graph queries over the embedding corpus (round 5).

The kNN graph — top-k neighbors for EVERY vector, not a handful of query
points — is the workhorse structure behind several curation passes a
training-data pipeline runs at scale: label-noise audits (neighbor
voting), graph-based clustering/coreset selection, and diversity
analysis. Built here on the IVF candidate-bucketing path
(operators/similarity.knn_graph): both sides of the candidate join are
the corpus keyed by ``list_id``, one co-partitioned shuffle each — the
broadcast-probes shape of ``ivf_topk`` cannot apply when every vector is
a query.

Oracles reuse oracle_ivf.ivf_prelude (centroid selection + assignment
are a deterministic md5-ordered sample, recomputable in pure SQL), so the
whole index-build + graph + audit pipeline is exactly mirrored in DuckDB.

Round 6 extends the census family over the SAME shared graph artifacts
(`_und_deg_ded`): `knn_degree_assortativity` (Newman's degree-mixing
coefficient from four exact integer sums) and `knn_local_clustering`
(per-node triangle incidence → integer-ppm clustering coefficient,
re-using the degree-ordered wedge closure).

List count: the graph tier runs its OWN ``KNN_LISTS`` (16, vs the serving
tier's shared 8) because candidate volume here is N²·n_probe/n_lists —
with every vector a query, n_lists must track sqrt(N) or the join goes
quadratic; 16 ≈ sqrt(2000) at the bench scale (measured ~2x candidate
reduction vs 8 at identical plan shape). A production deployment re-pins
this per corpus size at index-train time; the oracle mirrors whatever is
pinned.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from py_datalake_move_files_spark.operators import similarity as SIM
from py_datalake_move_files_spark.oracle_frags import dd_cosine
from py_datalake_move_files_spark.oracle_ivf import N_PROBE
from py_datalake_move_files_spark.oracle_knn import (  # leaf module: the
    KNN_EDGES_CTE as _KNN_EDGES_CTE,  # fragments are shared with
    KNN_K,  # queries_mining's graph queries without a circular import
    KNN_LISTS,
    KNN_PRELUDE as _KNN_PRELUDE,
    UND_DEG_DED_CTE as _UND_DEG_DED_CTE,
)
from py_datalake_move_files_spark.queries import _t, register


def _knn_centroids(spark, sf_dir: str):
    """Graph-tier centroids via the SINGLE shared (snapshot, n_lists)
    cache in queries_ivf — one cache-invalidation implementation for
    every tier (review r5: a verbatim copy here could silently diverge)."""
    from py_datalake_move_files_spark.queries_ivf import _centroids

    return _centroids(spark, sf_dir, n_lists=KNN_LISTS)

def _knn_edges(spark, sf_dir):
    """The kNN graph, built ONCE per (embeddings snapshot, graph params)
    and served from the session artifact cache: six audit queries
    (edges/density/label-agreement/triangles/components/…) consume the
    same graph, which in production is an index artifact built at ingest,
    not re-derived per query (functions/artifacts.py documents the key
    discipline — app, shuffle-layout, snapshot, params)."""
    from py_datalake_move_files_spark.catalog import table_snapshot
    from py_datalake_move_files_spark.functions.artifacts import shared_artifact

    def build():
        emb = _t(spark, sf_dir, "embeddings")
        return SIM.knn_graph(
            emb, k=KNN_K, n_lists=KNN_LISTS, n_probe=N_PROBE,
            centroids=_knn_centroids(spark, sf_dir),
        )

    key = (
        "knn_edges",
        table_snapshot(sf_dir, "embeddings"),
        KNN_K,
        KNN_LISTS,
        N_PROBE,
    )
    return shared_artifact(spark, key, build)


@register(
    "knn_graph_edges",
    _KNN_PRELUDE + _KNN_EDGES_CTE + """
SELECT query_id, neighbor_id, cosine_sim, rnk FROM edges
""",
)
def q_knn_graph_edges(spark, sf_dir):
    """The kNN graph itself: top-{KNN_K} IVF-bucketed neighbors per
    vector. Assignment + probing are zero-shuffle map stages over centroid
    literals; the candidate join shuffles each corpus copy ONCE on
    list_id (plan-pinned: no broadcast of a corpus-sized side, no
    cartesian product); the only other exchange is the per-query top-k
    window."""
    return _knn_edges(spark, sf_dir)


@register(
    "knn_label_agreement",
    _KNN_PRELUDE + _KNN_EDGES_CTE + """,
lab AS (SELECT vec_id, label FROM embeddings),
j AS (
  SELECT e.query_id, lq.label AS q_label, ln.label AS n_label
  FROM edges e
  JOIN lab lq ON lq.vec_id = e.query_id
  JOIN lab ln ON ln.vec_id = e.neighbor_id
)
SELECT query_id AS vec_id, q_label AS label,
  CAST(count(*) AS BIGINT) AS n_neighbors,
  CAST(sum(CASE WHEN n_label = q_label THEN 1 ELSE 0 END) AS BIGINT) AS n_same,
  round(CAST(sum(CASE WHEN n_label = q_label THEN 1 ELSE 0 END) AS DOUBLE)
        / CAST(count(*) AS DOUBLE), 6) AS agreement
FROM j GROUP BY query_id, q_label
""",
)
def q_knn_label_agreement(spark, sf_dir):
    """kNN label-agreement audit (the Confident-Learning-style neighbor
    vote): for each vector, the fraction of its top-{KNN_K} neighbors
    sharing its label. Low agreement flags probable label noise — the
    standard triage pass before training on a labeled corpus.

    Rides on the same edge list as ``knn_graph_edges``; the two label
    joins key on vector id (Catalyst broadcasts them while the label
    projection fits, falls back to shuffle joins beyond — either is one
    pass over the N·k edge table), then one map-side-combined aggregate
    per query vector."""
    edges = _knn_edges(spark, sf_dir)
    lab = _t(spark, sf_dir, "embeddings").select("vec_id", "label")
    lq = lab.select(
        F.col("vec_id").alias("q_vec_id"), F.col("label").alias("q_label")
    )
    ln = lab.select(
        F.col("vec_id").alias("n_vec_id"), F.col("label").alias("n_label")
    )
    j = edges.join(lq, F.col("query_id") == F.col("q_vec_id")).join(
        ln, F.col("neighbor_id") == F.col("n_vec_id")
    )
    return (
        j.groupBy(F.col("query_id").alias("vec_id"), F.col("q_label").alias("label"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_neighbors"),
            F.sum(
                F.when(F.col("n_label") == F.col("q_label"), 1).otherwise(0)
            ).cast("long").alias("n_same"),
        )
        .withColumn(
            "agreement",
            F.round(F.col("n_same").cast("double") / F.col("n_neighbors").cast("double"), 6),
        )
    )


@register(
    "knn_density_scores",
    _KNN_PRELUDE + _KNN_EDGES_CTE + """
SELECT query_id AS vec_id,
  CAST(count(*) AS BIGINT) AS n_neighbors,
  round(CAST(sum(CAST(round(cosine_sim * 1000000) AS BIGINT)) AS DOUBLE)
        / (count(*) * 1000000.0), 6) AS mean_cos,
  CAST(sum(CASE WHEN cosine_sim >= 0.8 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_close
FROM edges GROUP BY query_id
""",
)
def q_knn_density_scores(spark, sf_dir):
    """Local-density / redundancy score per vector: mean cosine to its
    top-{KNN_K} neighbors plus a count of near-duplicate-range (≥0.8)
    neighbors. The diversity-selection signal — coreset builders drop or
    down-weight high-density vectors (their information is carried by
    neighbors) and keep low-density ones; it is also SemDeDup's ranking
    signal generalized from clusters to the kNN graph.

    Rides the shared edge list (one more map-side-combined aggregate over
    N·k rows); the mean folds integer micro-units and divides once, so no
    float-summation-order risk reaches the hash."""
    edges = _knn_edges(spark, sf_dir)
    return (
        edges.groupBy(F.col("query_id").alias("vec_id"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_neighbors"),
            F.sum(
                F.round(F.col("cosine_sim") * 1000000).cast("long")
            ).alias("__sum_micro"),
            F.sum(
                F.when(F.col("cosine_sim") >= 0.8, 1).otherwise(0)
            ).cast("long").alias("n_close"),
        )
        .select(
            "vec_id",
            "n_neighbors",
            F.round(
                F.col("__sum_micro").cast("double")
                / (F.col("n_neighbors") * F.lit(1000000.0)),
                6,
            ).alias("mean_cos"),
            "n_close",
        )
    )


# --- embedding-space class geometry ----------------------------------------

_CENT_SCALE = 1_000_000

_CENT_ORACLE = f"""
WITH x AS (
  SELECT label, i,
    CAST(round(CAST(embedding[i] AS DOUBLE) * {_CENT_SCALE}) AS BIGINT) AS q
  FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i)
),
s AS (
  SELECT label, i, CAST(sum(q) AS BIGINT) AS sq, CAST(count(*) AS BIGINT) AS n
  FROM x GROUP BY label, i
),
c AS (
  SELECT label, n,
    list(CAST(sq AS DOUBLE) / (n * {_CENT_SCALE}.0) ORDER BY i) AS cv
  FROM s GROUP BY label, n
)
SELECT a.label AS label_a, b.label AS label_b,
  a.n AS n_a, b.n AS n_b,
  {dd_cosine('a.cv', 'b.cv')} AS centroid_cos
FROM c a JOIN c b ON a.label < b.label
"""


@register("label_centroid_similarity", _CENT_ORACLE)
def q_label_centroid_similarity(spark, sf_dir):
    """Embedding-space class-geometry audit: cosine between per-label mean
    vectors, for every label pair. High inter-centroid cosine = entangled
    classes — the triage signal before training a classifier on the
    labels, and the companion view to `knn_label_agreement` (which scores
    individual vectors, not class structure).

    100 TB shape: per-dimension sums fold FIXED-POINT integers
    (round(v·1e6) as BIGINT), so the centroid means are exact and
    partition-order-independent — the kmeans_refine device; the pairwise
    stage runs over ONE tiny row per (label, dim) aggregate, and the
    final 10×10 centroid cross join is driver-trivial while the corpus is
    touched exactly once, map-only before the (label, dim) aggregate."""
    emb = _t(spark, sf_dir, "embeddings")
    x = emb.select(
        "label", F.posexplode("embedding").alias("i", "v")
    ).select(
        "label",
        "i",
        F.round(F.col("v").cast("double") * _CENT_SCALE).cast("long").alias("q"),
    )
    s = x.groupBy("label", "i").agg(
        F.sum("q").cast("long").alias("sq"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    c = (
        s.groupBy("label", "n")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("i", "sq"))
            ).alias("__ord")
        )
        .select(
            "label",
            "n",
            F.expr(
                f"transform(__ord, ce -> CAST(ce.sq AS DOUBLE) / (n * {_CENT_SCALE}.0))"
            ).alias("cv"),
        )
    )
    from py_datalake_move_files_spark.operators.similarity import dot, norm

    a = c.select(
        F.col("label").alias("label_a"), F.col("n").alias("n_a"),
        F.col("cv").alias("cv_a"),
    ).withColumn("nrm_a", norm("cv_a"))
    b = c.select(
        F.col("label").alias("label_b"), F.col("n").alias("n_b"),
        F.col("cv").alias("cv_b"),
    ).withColumn("nrm_b", norm("cv_b"))
    return (
        a.join(b, F.col("label_a") < F.col("label_b"))
        .select(
            "label_a",
            "label_b",
            "n_a",
            "n_b",
            F.round(
                dot("cv_a", "cv_b") / (F.col("nrm_a") * F.col("nrm_b")), 6
            ).alias("centroid_cos"),
        )
    )


# --- shared undirected-graph frames (Spark side of _UND_DEG_DED_CTE) ------


def _und_deg_ded(spark, sf_dir):
    """The (undirected edges, degrees, degree-directed edges) triple the
    whole graph-census family consumes, built ONCE per embeddings
    snapshot and served from the session artifact cache: `und` and `ded`
    are each referenced by several downstream branches in every consumer
    (without the lineage cut Catalyst re-derives the full kNN pipeline
    per reference — measured 53 vs 9 exchanges on the triangle census),
    and three queries (triangles, local clustering, assortativity) share
    them verbatim. `deg` is one map-side-combined count over `und`,
    cheap to re-derive against the checkpointed edge blocks."""
    from py_datalake_move_files_spark.catalog import table_snapshot
    from py_datalake_move_files_spark.functions.artifacts import shared_artifact

    snap = (table_snapshot(sf_dir, "embeddings"), KNN_K, KNN_LISTS, N_PROBE)

    def build_und():
        return (
            _knn_edges(spark, sf_dir)
            .select(
                F.least("query_id", "neighbor_id").alias("u"),
                F.greatest("query_id", "neighbor_id").alias("v"),
            )
            .distinct()
        )

    und = shared_artifact(spark, ("knn_und", *snap), build_und)
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("dg"))
    )

    def build_ded():
        da = deg.select(F.col("node").alias("u"), F.col("dg").alias("du"))
        db = deg.select(F.col("node").alias("v"), F.col("dg").alias("dv"))
        u_first = F.col("du") <= F.col("dv")
        return (
            und.join(da, "u")
            .join(db, "v")
            .select(
                F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("lo"),
                F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("hi"),
                F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("hid"),
            )
        )

    ded = shared_artifact(spark, ("knn_ded", *snap), build_ded)
    return und, deg, ded


# --- triangle census / clustering coefficient over the kNN graph ----------

_TRI_ORACLE = _KNN_PRELUDE + _KNN_EDGES_CTE + _UND_DEG_DED_CTE + """,
tri AS (
  SELECT count(*) AS t
  FROM ded d1
  JOIN ded d2 ON d1.lo = d2.lo
    AND ((d1.hid < d2.hid) OR (d1.hid = d2.hid AND d1.hi < d2.hi))
  JOIN ded d3 ON d3.lo = d1.hi AND d3.hi = d2.hi
),
wd AS (
  SELECT CAST(sum(dg * (dg - 1) // 2) AS BIGINT) AS n_wedges,
         count(*) AS n_nodes
  FROM deg
),
ne AS (SELECT count(*) AS n_edges FROM und)
SELECT CAST(wd.n_nodes AS BIGINT) AS n_nodes,
  CAST(ne.n_edges AS BIGINT) AS n_edges,
  wd.n_wedges,
  CAST(tri.t AS BIGINT) AS n_triangles,
  CAST(3 * tri.t * 1000000 // wd.n_wedges AS BIGINT) AS closure_ppm
FROM wd CROSS JOIN ne CROSS JOIN tri
"""


@register("knn_triangle_count", _TRI_ORACLE)
def q_knn_triangle_count(spark, sf_dir):
    """Triangle census + global clustering coefficient over the
    (undirected) kNN graph — the graph-community signal behind
    curation-time redundancy analysis: a corpus whose embedding graph
    closes many triangles is clumpy (near-duplicate neighborhoods,
    SemDeDup targets); one that closes few is spread thin.

    The algorithm is the degree-ordered node-iterator — the standard
    distributed triangle count (Suri & Vassilvitskii's MR design): every
    undirected edge is DIRECTED from its lower-(degree, id)-rank endpoint
    to the higher, each wedge is generated at its lowest-rank vertex
    (join 1, on ``lo``), and closed by an equi-join on the directed third
    edge (join 2). Directing by degree bounds per-vertex wedge fan-out by
    the graph's arboricity — O(m^1.5) candidates total on ANY graph, vs
    O(sum deg^2) for the naive id-ordering where one hub (a vector many
    others call neighbor: in-degree is NOT k-bounded) goes quadratic.
    Both joins are equi-keyed shuffles of the edge list; degrees come
    from one map-side-combined count. ``closure_ppm = 3T/W`` in integer
    parts-per-million (W = wedge count from degrees), so no float ratio
    reaches the hash.

    The undirected and directed edge tables are ``localCheckpoint``-ed
    (lazy) because they are each referenced by 3+ downstream branches —
    without the cut, Catalyst re-derives the whole kNN pipeline per
    reference (measured: 53 exchanges vs 9; same device as the pagerank
    edge build, queries_scale.py)."""
    und, deg, ded = _und_deg_ded(spark, sf_dir)
    d1 = ded.select(
        F.col("lo").alias("w_lo"), F.col("hi").alias("w_a"), F.col("hid").alias("w_ad")
    )
    d2 = ded.select(
        F.col("lo").alias("w_lo"), F.col("hi").alias("w_b"), F.col("hid").alias("w_bd")
    )
    d3 = ded.select(F.col("lo").alias("c_a"), F.col("hi").alias("c_b"))
    wedge_rank = (F.col("w_ad") < F.col("w_bd")) | (
        (F.col("w_ad") == F.col("w_bd")) & (F.col("w_a") < F.col("w_b"))
    )
    tri = (
        d1.join(d2, "w_lo")
        .where(wedge_rank)
        .join(
            d3,
            (F.col("w_a") == F.col("c_a")) & (F.col("w_b") == F.col("c_b")),
        )
        .agg(F.count(F.lit(1)).alias("t"))
    )
    wd = deg.agg(
        F.sum(F.expr("dg * (dg - 1) div 2")).alias("n_wedges"),
        F.count(F.lit(1)).alias("n_nodes"),
    )
    ne = und.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        wd.crossJoin(ne)
        .crossJoin(tri)
        .select(
            F.col("n_nodes").cast("long"),
            F.col("n_edges").cast("long"),
            F.col("n_wedges").cast("long"),
            F.col("t").cast("long").alias("n_triangles"),
            F.expr("(3 * t * 1000000) div n_wedges").alias("closure_ppm"),
        )
    )


# --------------------------------------------------------------------------
# connected components of the kNN graph (cluster census)
# --------------------------------------------------------------------------

_KNN_CC_ORACLE = (
    "WITH RECURSIVE "
    + _KNN_PRELUDE[len("WITH ") :].strip()
    + _KNN_EDGES_CTE
    + """,
und AS (
  SELECT query_id AS src, neighbor_id AS dst FROM edges
  UNION SELECT neighbor_id, query_id FROM edges
),
reach(src, dst) AS (
  SELECT src, dst FROM und
  UNION
  SELECT r.src, e.dst FROM reach r JOIN und e ON r.dst = e.src
),
cc AS (
  SELECT src AS vec_id, least(src, min(dst)) AS cluster_id
  FROM reach GROUP BY src
)
SELECT CAST(cluster_id AS BIGINT) AS cluster_id,
       CAST(count(*) AS BIGINT) AS n_members,
       CAST(min(vec_id) AS BIGINT) AS min_vec_id,
       CAST(max(vec_id) AS BIGINT) AS max_vec_id
FROM cc GROUP BY cluster_id
"""
)


@register("knn_components", _KNN_CC_ORACLE)
def q_knn_components(spark, sf_dir):
    """Connected-component census of the kNN graph — the cluster structure
    underneath the density/label audits: mutually-reachable neighborhoods
    (one giant component = a healthy embedding manifold; many shards =
    disconnected modes or an over-tight k). Reuses the audited iterative
    min-label propagation (operators/clusters.connected_components, the
    aggregate-then-iterate shape with per-round lineage cuts); a kNN graph
    can carry long chains, so the iteration cap is raised and
    NON-convergence now raises instead of returning partially-propagated
    labels. Oracle = the same recursive transitive-closure CTE as the
    dedup clusters, over the IVF-derived edge set."""
    from py_datalake_move_files_spark.operators.clusters import (
        connected_components,
    )

    edges = _knn_edges(spark, sf_dir).select(
        F.col("query_id").alias("id_a"), F.col("neighbor_id").alias("id_b")
    )
    cc = connected_components(edges, max_iterations=100)
    return cc.groupBy(F.col("cluster_id").cast("long").alias("cluster_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.min("node").cast("long").alias("min_vec_id"),
        F.max("node").cast("long").alias("max_vec_id"),
    )


# --------------------------------------------------------------------------
# degree assortativity of the kNN graph (Newman mixing coefficient)
# --------------------------------------------------------------------------

#: the Pearson correlation of endpoint degrees over the 2m directed edge
#: orientations (Newman 2002). All four sufficient statistics are EXACT
#: integer sums folded in one aggregate; only the final single-row scalar
#: expression — textually identical in both engines — touches doubles.
_ASSORT_FINAL = """
SELECT CAST(nn.n_nodes AS BIGINT) AS n_nodes,
  CAST(s.m2 / 2 AS BIGINT) AS n_edges,
  round((CAST(s.m2 AS DOUBLE) * CAST(s.sxy AS DOUBLE)
         - CAST(s.sx AS DOUBLE) * CAST(s.sx AS DOUBLE))
        / (CAST(s.m2 AS DOUBLE) * CAST(s.sxx AS DOUBLE)
           - CAST(s.sx AS DOUBLE) * CAST(s.sx AS DOUBLE)), 6)
    AS assortativity
FROM s CROSS JOIN nn
"""

_ASSORT_ORACLE = _KNN_PRELUDE + _KNN_EDGES_CTE + _UND_DEG_DED_CTE + """,
dp AS (
  SELECT a.dg AS du, b.dg AS dv
  FROM und e JOIN deg a ON e.u = a.node JOIN deg b ON e.v = b.node
),
s AS (
  SELECT CAST(2 * count(*) AS BIGINT) AS m2,
         CAST(sum(du + dv) AS BIGINT) AS sx,
         CAST(sum(2 * du * dv) AS BIGINT) AS sxy,
         CAST(sum(du * du + dv * dv) AS BIGINT) AS sxx
  FROM dp
),
nn AS (SELECT count(*) AS n_nodes FROM deg)
""" + _ASSORT_FINAL


@register("knn_degree_assortativity", _ASSORT_ORACLE)
def q_knn_degree_assortativity(spark, sf_dir):
    """Degree assortativity of the kNN graph — Newman's mixing
    coefficient: do high-degree vectors (hubs: vectors many others call
    neighbor) neighbor other hubs (r > 0) or the periphery (r < 0)?
    A strongly disassortative embedding graph is the hub-and-spoke
    signature of a corpus dominated by a few generic attractor
    documents — the same hubs that make naive triangle counting
    quadratic and that ANN recall audits over-sample.

    Plan: the degree join is the SAME two equi-joins the census family
    already runs against the shared `und`/`deg` artifacts; everything
    after is ONE map-side-combined aggregate folding four exact integer
    sums over x = du, y = dv across both edge orientations (symmetric, so
    Σx = Σy and Σx² = Σy² fold once as du+dv / du²+dv²). The Pearson
    ratio is a single-row scalar expression, textually identical in the
    oracle, rounded to 6 dp. At extreme edge counts the four int64 sums
    stay exact (degrees are k-bounded on the out side, arboricity-bounded
    on the in side); the final products run in doubles on ONE row —
    an audit scalar, not a per-row value."""
    und, deg, _ = _und_deg_ded(spark, sf_dir)
    da = deg.select(F.col("node").alias("u"), F.col("dg").alias("du"))
    db = deg.select(F.col("node").alias("v"), F.col("dg").alias("dv"))
    dp = und.join(da, "u").join(db, "v")
    s = dp.agg(
        (2 * F.count(F.lit(1))).cast("long").alias("m2"),
        F.sum(F.col("du") + F.col("dv")).cast("long").alias("sx"),
        F.sum(2 * F.col("du") * F.col("dv")).cast("long").alias("sxy"),
        F.sum(F.col("du") * F.col("du") + F.col("dv") * F.col("dv"))
        .cast("long")
        .alias("sxx"),
    )
    nn = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    return (
        s.crossJoin(nn)
        .select(
            F.col("n_nodes").cast("long"),
            F.expr("CAST(m2 / 2 AS BIGINT)").alias("n_edges"),
            F.round(
                F.expr(
                    "(CAST(m2 AS DOUBLE) * CAST(sxy AS DOUBLE)"
                    " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
                    " / (CAST(m2 AS DOUBLE) * CAST(sxx AS DOUBLE)"
                    " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
                ),
                6,
            ).alias("assortativity"),
        )
    )


# --------------------------------------------------------------------------
# per-node local clustering coefficient (triangle incidence census)
# --------------------------------------------------------------------------

_LCC_ORACLE = _KNN_PRELUDE + _KNN_EDGES_CTE + _UND_DEG_DED_CTE + """,
tri3 AS (
  SELECT d1.lo AS a, d1.hi AS b, d2.hi AS c
  FROM ded d1
  JOIN ded d2 ON d1.lo = d2.lo
    AND ((d1.hid < d2.hid) OR (d1.hid = d2.hid AND d1.hi < d2.hi))
  JOIN ded d3 ON d3.lo = d1.hi AND d3.hi = d2.hi
),
tn AS (
  SELECT node, CAST(count(*) AS BIGINT) AS t FROM (
    SELECT a AS node FROM tri3
    UNION ALL SELECT b AS node FROM tri3
    UNION ALL SELECT c AS node FROM tri3
  ) GROUP BY node
)
SELECT d.node AS vec_id, CAST(d.dg AS BIGINT) AS degree,
  CAST(coalesce(tn.t, 0) AS BIGINT) AS n_triangles,
  CAST(CASE WHEN d.dg >= 2
       THEN 2 * coalesce(tn.t, 0) * 1000000 // (d.dg * (d.dg - 1))
       ELSE 0 END AS BIGINT) AS lcc_ppm
FROM deg d LEFT JOIN tn ON d.node = tn.node
"""


@register("knn_local_clustering", _LCC_ORACLE)
def q_knn_local_clustering(spark, sf_dir):
    """Per-node local clustering coefficient over the kNN graph: for each
    vector, 2·T / (d·(d−1)) in integer ppm — the fraction of its
    neighbor pairs that are themselves neighbors. The per-vector form of
    `knn_triangle_count`'s global closure: a vector with high local
    clustering sits inside a tight near-duplicate clique (SemDeDup's
    target neighborhoods); low-clustering hubs are generic attractors
    bridging unrelated regions.

    Plan: the SAME degree-ordered two-join closure as the global census
    (O(m^1.5) wedge candidates on any graph), except each closed triangle
    now emits its three corners — a 3× unionAll of the tiny triangle
    table, NOT a re-join — followed by one count per node and a left
    join back to the degree table so zero-triangle nodes keep a row.
    The ratio is exact integer ppm (2·T·1e6 DIV d·(d−1)); no float
    reaches the hash."""
    und, deg, ded = _und_deg_ded(spark, sf_dir)
    d1 = ded.select(
        F.col("lo").alias("w_lo"), F.col("hi").alias("w_a"), F.col("hid").alias("w_ad")
    )
    d2 = ded.select(
        F.col("lo").alias("w_lo"), F.col("hi").alias("w_b"), F.col("hid").alias("w_bd")
    )
    d3 = ded.select(F.col("lo").alias("c_a"), F.col("hi").alias("c_b"))
    wedge_rank = (F.col("w_ad") < F.col("w_bd")) | (
        (F.col("w_ad") == F.col("w_bd")) & (F.col("w_a") < F.col("w_b"))
    )
    tri3 = (
        d1.join(d2, "w_lo")
        .where(wedge_rank)
        .join(
            d3,
            (F.col("w_a") == F.col("c_a")) & (F.col("w_b") == F.col("c_b")),
        )
        .select(
            F.col("w_lo").alias("a"), F.col("w_a").alias("b"), F.col("w_b").alias("c")
        )
        .localCheckpoint(eager=False)
    )
    tn = (
        tri3.select(F.col("a").alias("node"))
        .unionAll(tri3.select(F.col("b").alias("node")))
        .unionAll(tri3.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
    )
    return (
        deg.join(tn, "node", "left")
        .select(
            F.col("node").alias("vec_id"),
            F.col("dg").cast("long").alias("degree"),
            F.coalesce(F.col("t"), F.lit(0)).cast("long").alias("n_triangles"),
            F.when(
                F.col("dg") >= 2,
                F.expr(
                    "(2 * coalesce(t, 0) * 1000000)"
                    " div (dg * (dg - 1))"
                ),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("lcc_ppm"),
        )
    )


# --------------------------------------------------------------------------
# mutual (reciprocal) kNN pairs — the SNN primitive
# --------------------------------------------------------------------------

_MUTUAL_ORACLE = _KNN_PRELUDE + _KNN_EDGES_CTE + """
SELECT e1.query_id AS id_a, e1.neighbor_id AS id_b,
  e1.cosine_sim AS cosine_sim,
  CAST(e1.rnk AS INT) AS rnk_ab, CAST(e2.rnk AS INT) AS rnk_ba
FROM edges e1 JOIN edges e2
  ON e2.query_id = e1.neighbor_id AND e2.neighbor_id = e1.query_id
WHERE e1.query_id < e1.neighbor_id
"""


@register("knn_mutual_pairs", _MUTUAL_ORACLE)
def q_knn_mutual_pairs(spark, sf_dir):
    """Mutual (reciprocal) kNN pairs: (a, b) kept only when each is in
    the OTHER's top-{KNN_K} — the shared-nearest-neighbor primitive
    behind SNN clustering and high-precision near-dup verification
    (one-directional kNN edges are asymmetric in dense regions; mutuality
    is the standard cheap filter that removes hub-induced false
    neighbors). Emits both ranks so downstream can weight by agreement.

    Shape: the shared session-cached kNN graph artifact (built once per
    snapshot/params — ``_knn_edges``) self-joined on the reversed pair;
    both sides are the SAME k·N-row edge frame hashed on the join key, so
    the pairing costs one co-partitioned shuffle of k·N rows regardless
    of corpus size, and the lower-id filter halves the output without a
    distinct."""
    e = _knn_edges(spark, sf_dir)
    e1 = e.select(
        F.col("query_id").alias("id_a"),
        F.col("neighbor_id").alias("id_b"),
        "cosine_sim",
        F.col("rnk").alias("rnk_ab"),
    )
    e2 = e.select(
        F.col("query_id").alias("id_b"),
        F.col("neighbor_id").alias("id_a"),
        F.col("rnk").alias("rnk_ba"),
    )
    return (
        e1.join(e2, ["id_a", "id_b"])
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            "cosine_sim",
            F.col("rnk_ab").cast("int"),
            F.col("rnk_ba").cast("int"),
        )
    )
