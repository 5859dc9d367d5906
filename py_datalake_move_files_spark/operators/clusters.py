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


def connected_components(
    pairs: DataFrame,
    *,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """Cluster ids for every node appearing in ``pairs``.

    Returns ``(node, cluster_id)`` where ``cluster_id`` is the minimum node
    id reachable from ``node`` (deterministic representative).
    """
    # Materialize the pair list ONCE and cut its lineage: the symmetrizing
    # union below references it twice, and every iteration's plan would
    # otherwise embed the whole upstream pair pipeline (minhash, LSH,
    # verify) — persist() alone keeps the logical plan growing, so Catalyst
    # re-analyzes an ever-larger tree each round (measured: round cost
    # dominated by planning, not data). localCheckpoint truncates the plan
    # to an RDD scan → constant-size plans per round. On a real cluster,
    # swap for reliable checkpoint() if executor loss matters.
    p = pairs.select(
        F.col(a_col).alias("src"), F.col(b_col).alias("dst")
    ).localCheckpoint(eager=True)
    edges = (
        p.union(p.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
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
        new_labels = (
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
            .localCheckpoint(eager=True)
        )
        changed = new_labels.where(F.col("__changed")).count()
        labels = new_labels.drop("__changed")
        if changed == 0:
            break

    # one row per clustered node, lineage already truncated
    return labels.select(F.col("node"), F.col("label").alias("cluster_id"))


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Full dedup grouping: cluster members from ``pairs`` plus singletons
    (cluster of themselves). Returns ``(doc_id, cluster_id, is_representative)``.
    """
    cc = connected_components(pairs)
    base = docs.select(F.col(id_col).alias("node"))
    labeled = base.join(cc, "node", "left").select(
        F.col("node").alias(id_col),
        F.coalesce(F.col("cluster_id"), F.col("node")).alias("cluster_id"),
    )
    return labeled.withColumn(
        "is_representative", (F.col(id_col) == F.col("cluster_id")).cast("boolean")
    )
