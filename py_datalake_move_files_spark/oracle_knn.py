"""Shared kNN-graph oracle fragments + graph parameters (LEAF module).

Factored out of queries_knn so that BOTH queries_knn and queries_mining
(link prediction, rich club, hop histogram) can embed the kNN
prelude/edges/undirected-degree CTE chains into their oracle SQL at
registration time without a module-level circular import — a direct
``import queries_knn`` used to break because queries_mining's
registration-time ``_link_oracle()`` imported these names back out of the
partially-initialized queries_knn (the oracle_ivf split, applied to the
graph tier; surfaced by tests/test_imports.py once it covered every
entry module). Imports only leaf fragment modules, so it completes
regardless of which registry module loads first.
"""

from __future__ import annotations

from py_datalake_move_files_spark.oracle_frags import dd_cosine
from py_datalake_move_files_spark.oracle_ivf import N_PROBE, ivf_prelude

KNN_K = 5
KNN_LISTS = 16

KNN_PRELUDE = ivf_prelude(KNN_LISTS)

#: shared oracle chain: every vector probes its N_PROBE nearest lists,
#: candidates join the (rn = 1) assignment on list_id, rounded cosine,
#: per-query top-k with ties to the lowest neighbor id — mirroring
#: operators/similarity.knn_graph step for step
KNN_EDGES_CTE = f""",
probes AS (
  SELECT vec_id AS query_id, embedding AS q_vec, cid AS list_id FROM (
    SELECT *, row_number() OVER (
      PARTITION BY vec_id ORDER BY s DESC, cid ASC) AS rn
    FROM sc
  ) WHERE rn <= {N_PROBE}
),
scored AS (
  SELECT p.query_id, a.vec_id AS neighbor_id,
    {dd_cosine('p.q_vec', 'a.embedding')} AS cosine_sim
  FROM probes p JOIN asg a USING (list_id)
  WHERE a.vec_id <> p.query_id
),
edges AS (
  SELECT query_id, neighbor_id, cosine_sim, CAST(rn AS INT) AS rnk FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id ASC) AS rn
    FROM scored
  ) WHERE rn <= {KNN_K}
)
"""

#: shared undirected-graph chain: distinct undirected edges, degrees from
#: one union-all count, and every edge DIRECTED from its lower-(degree, id)
#: endpoint — the degree-ordered node-iterator frame that the triangle
#: census, the per-node clustering coefficient, and (und/deg only) the
#: assortativity audit all consume.
UND_DEG_DED_CTE = """,
und AS (
  SELECT DISTINCT least(query_id, neighbor_id) AS u,
                  greatest(query_id, neighbor_id) AS v
  FROM edges
),
deg AS (
  SELECT node, count(*) AS dg FROM (
    SELECT u AS node FROM und UNION ALL SELECT v AS node FROM und
  ) GROUP BY node
),
ded AS (
  SELECT
    CASE WHEN a.dg <= b.dg THEN e.u ELSE e.v END AS lo,
    CASE WHEN a.dg <= b.dg THEN e.v ELSE e.u END AS hi,
    CASE WHEN a.dg <= b.dg THEN b.dg ELSE a.dg END AS hid
  FROM und e JOIN deg a ON e.u = a.node JOIN deg b ON e.v = b.node
)
"""
