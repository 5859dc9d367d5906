"""Connected components over near-duplicate pair graphs — the step that
turns pairwise dedup output (MinHash/LSH/embedding pairs) into dedup GROUPS
(one representative per cluster).

Iterative min-label propagation on DataFrames: every node repeatedly adopts
the smallest label among itself and its neighbors until a fixed point. This
is the standard large-graph CC approach on Spark (no GraphX dependency, pure
joins + aggregates):

- each iteration is one join (labels × edges) + one groupBy min — both on
  the node id, so at scale consecutive iterations reuse the same hash
  partitioning (co-partitioned, no extra shuffle beyond the two per round);
- iteration count is O(graph diameter); near-dup clusters are tiny and
  star-shaped, so 2-4 rounds converge even at 100 TB corpus scale;
- convergence is detected by counting changed labels (one action per round —
  the driver loop is control flow only, no data ever collects).

An `(a)-(b)` edge list is symmetrized internally; singleton nodes (no edge)
are not emitted — callers union them in if needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _lineage_cutter(df_or_spark, checkpoint_dir: str | None):
    """Return a ``cut(df) -> df`` lineage-truncating function.

    ``checkpoint_dir=None`` → ``localCheckpoint`` (blocks live on executor
    local storage — fast, zero HDFS traffic, but an executor loss
    invalidates its blocks mid-iteration and fails the job). Passing a
    directory switches to RELIABLE ``checkpoint()`` (blocks written to the
    fault-tolerant store): the right choice for long CC runs on a real
    cluster where executor churn is expected.

    The SparkContext checkpoint dir is application-global state: if the
    app already configured one, it is KEPT (setting ours would silently
    redirect every other checkpoint() in the application); ``checkpoint_dir``
    only seeds the setting when none exists. Checkpoint-file lifecycle:
    intermediate per-iteration files are garbage-collected by Spark's
    ContextCleaner when ``spark.cleaner.referenceTracking.cleanCheckpoints``
    is enabled (on by default in this engine's session factory); the final
    checkpoint backing the returned DataFrame lives until the app exits or
    the caller deletes the directory.
    """
    if checkpoint_dir is None:
        return lambda df: df.localCheckpoint(eager=True)
    sc = df_or_spark.sparkSession.sparkContext if isinstance(
        df_or_spark, DataFrame
    ) else df_or_spark.sparkContext
    existing = sc._jsc.sc().getCheckpointDir()
    if existing.isEmpty():
        sc.setCheckpointDir(checkpoint_dir)
    return lambda df: df.checkpoint(eager=True)


def connected_components(
    pairs: DataFrame,
    *,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iterations: int = 20,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Cluster ids for every node appearing in ``pairs``.

    Returns ``(node, cluster_id)`` where ``cluster_id`` is the minimum node
    id reachable from ``node`` (deterministic representative).

    Propagation is one-hop neighbor-min per round with an early exit at
    convergence and a LOUD failure at the iteration cap (below). A
    pointer-doubling variant (relabel through label-of-label, O(log
    diameter) rounds) was measured SLOWER here — the extra per-round
    self-join + full-outer merge cost more than the rounds it saved on
    real graphs, where high-degree hubs already spread the min label in
    few hops (knn_components: 3.8 s one-hop vs 6.8 s doubled at sf0.1).

    ``checkpoint_dir``: None (default) cuts lineage with ``localCheckpoint``
    — fastest, but executor-loss-fragile; pass a fault-tolerant directory
    (HDFS/S3 path on a real cluster) to use reliable ``checkpoint()``
    instead. Results are identical either way (tested).
    """
    # Materialize the pair list ONCE and cut its lineage: the symmetrizing
    # union below references it twice, and every iteration's plan would
    # otherwise embed the whole upstream pair pipeline (minhash, LSH,
    # verify) — persist() alone keeps the logical plan growing, so Catalyst
    # re-analyzes an ever-larger tree each round (measured: round cost
    # dominated by planning, not data). Checkpointing truncates the plan
    # to an RDD scan → constant-size plans per round.
    cut = _lineage_cutter(pairs, checkpoint_dir)
    p = cut(pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst")))
    edges = cut(
        p.union(p.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
    )
    labels = cut(
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )

    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nmin"))
        )
        # one action per round: the checkpoint materializes labels AND the
        # change flag together (a separate count() on the pre-checkpoint
        # frame would re-run the join a second time)
        new_labels = cut(
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
                ).alias("new_label"),
                (
                    F.least(
                        F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
                    )
                    != F.col("label")
                ).alias("__changed"),
            )
            .withColumnRenamed("new_label", "label")
        )
        changed = new_labels.where(F.col("__changed")).count()
        labels = new_labels.drop("__changed")
        if changed == 0:
            break
    else:
        # silent wrong labels are worse than a loud stop: min-label
        # propagation advances one hop per round, so a graph whose
        # min-eccentricity exceeds the cap (long chains — e.g. a kNN graph)
        # would return partially-propagated clusters that LOOK valid
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            f"iterations ({changed} labels still changing) — raise "
            f"max_iterations (graph diameter exceeds the cap)"
        )

    # one row per clustered node, lineage already truncated
    return labels.select(F.col("node"), F.col("label").alias("cluster_id"))


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    *,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Full dedup grouping: cluster members from ``pairs`` plus singletons
    (cluster of themselves). Returns ``(doc_id, cluster_id, is_representative)``.
    ``checkpoint_dir`` is forwarded to :func:`connected_components`.
    """
    cc = connected_components(pairs, checkpoint_dir=checkpoint_dir)
    base = docs.select(F.col(id_col).alias("node"))
    labeled = base.join(cc, "node", "left").select(
        F.col("node").alias(id_col),
        F.coalesce(F.col("cluster_id"), F.col("node")).alias("cluster_id"),
    )
    return labeled.withColumn(
        "is_representative", (F.col(id_col) == F.col("cluster_id")).cast("boolean")
    )
