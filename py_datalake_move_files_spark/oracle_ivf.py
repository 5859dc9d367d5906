"""Shared IVF oracle fragment + index parameters.

Factored out of queries_ivf so that BOTH queries_ivf and queries_pq can
embed the centroid-selection/assignment CTE chain into their oracle SQL at
registration time without a module-level circular import (queries_ivf ->
queries -> queries_pq -> queries_ivf broke any direct
``import queries_ivf`` before this split). Imports only the leaf fragment
module, so it completes regardless of which registry module loads first.
"""

from __future__ import annotations

from py_datalake_move_files_spark.oracle_frags import dd_cosine

N_LISTS = 8
N_PROBE = 2

#: shared oracle prelude: centroid selection + full-corpus assignment,
#: mirroring ivf_centroids (md5-ordered sample) and ivf_assign (argmax of
#: ROUNDED cosine, ties to the lowest centroid id)
IVF_PRELUDE = f"""
WITH c AS (
  SELECT vec_id AS cid, embedding AS cv FROM embeddings
  ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT {N_LISTS}
),
sc AS (
  SELECT e.vec_id, e.embedding, c.cid,
    {dd_cosine('e.embedding', 'c.cv')} AS s
  FROM embeddings e CROSS JOIN c
),
asg AS (
  SELECT vec_id, embedding, cid AS list_id FROM (
    SELECT *, row_number() OVER (
      PARTITION BY vec_id ORDER BY s DESC, cid ASC) AS rn
    FROM sc
  ) WHERE rn = 1
)
"""
