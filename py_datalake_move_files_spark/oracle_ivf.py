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


def ivf_prelude(n_lists: int = N_LISTS) -> str:
    """Oracle prelude: centroid selection + full-corpus assignment,
    mirroring ivf_centroids (md5-ordered sample) and ivf_assign (argmax of
    ROUNDED cosine, ties to the lowest centroid id). Parameterized so
    tiers with a different list count (the kNN graph runs n_lists closer
    to sqrt(N), queries_knn.py) stay textually in lockstep with the
    serving tier's chain — only the LIMIT differs."""
    return f"""
WITH c AS (
  SELECT vec_id AS cid, embedding AS cv FROM embeddings
  ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT {n_lists}
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


#: the serving tier's shared instance (n_lists = 8 across queries_ivf /
#: queries_pq so their recall metrics stay directly comparable)
IVF_PRELUDE = ivf_prelude()
