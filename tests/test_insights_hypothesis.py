"""Property-based tests for the round-6 operators: randomized inputs
checked against plain-Python recomputations of the SAME fixed-point
devices — the contracts that can silently break under refactoring are
the greedy selection order (kcenter) and the df-window/weighting
interplay (tfidf_pairs)."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from py_datalake_move_files_spark.operators.retrieval import tfidf_pairs
from py_datalake_move_files_spark.operators.similarity import kcenter_greedy

coord = st.integers(min_value=-8, max_value=8)
points = st.lists(
    st.tuples(coord, coord), min_size=2, max_size=8, unique=True
)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(pts=points)
def test_kcenter_greedy_matches_bruteforce(spark, pts):
    """Whole-operator greedy sequence == plain-Python greedy with the
    identical fixed-point distance, at every k up to len(pts)."""
    rows = [(i, [float(x), float(y)]) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    k = min(4, len(rows))
    got = kcenter_greedy(df, k=k, scale=1_000_000)

    def dfp(a, b):
        s = 0.0
        for x, y in zip(a, b):
            s = s + (x - y) * (x - y)
        v = s * 1_000_000
        return int(v + 0.5)

    pts_by_id = {i: v for i, v in rows}
    centers = [min(pts_by_id)]
    ref = [(1, centers[0], 0)]
    for r in range(2, k + 1):
        best = None
        for i in sorted(pts_by_id):
            dmin = min(dfp(pts_by_id[i], pts_by_id[c]) for c in centers)
            if best is None or dmin > best[1]:
                best = (i, dmin)
        centers.append(best[0])
        ref.append((r, best[0], best[1]))
    assert got == ref


token = st.sampled_from(["a", "b", "c", "d", "e"])
docs_strategy = st.lists(
    st.lists(token, min_size=1, max_size=6), min_size=2, max_size=7
)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(texts=docs_strategy)
def test_tfidf_pairs_matches_bruteforce(spark, texts):
    """Whole-operator TF-IDF cosine == plain-Python recomputation with the
    identical fixed-point weights and the same df window."""
    min_df, max_df, scale = 2, 3, 1000
    rows = [(i, " ".join(toks)) for i, toks in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["tfidf_cosine"]
        for r in tfidf_pairs(
            df, min_df=min_df, max_df=max_df, threshold=0.0, idf_scale=scale
        ).collect()
    }

    n = len(rows)
    tf: dict[int, dict[str, int]] = {}
    for i, toks in enumerate(texts):
        d: dict[str, int] = {}
        for t in toks:
            d[t] = d.get(t, 0) + 1
        tf[i] = d
    dfreq: dict[str, int] = {}
    for d in tf.values():
        for t in d:
            dfreq[t] = dfreq.get(t, 0) + 1
    vocab = {t for t, c in dfreq.items() if min_df <= c <= max_df}
    w = {
        i: {
            t: wv
            for t, c in d.items()
            if t in vocab
            and (wv := c * round(math.log(float(n) / float(dfreq[t])) * scale))
            != 0
        }
        for i, d in tf.items()
    }
    want = {}
    for a in range(n):
        for b in range(a + 1, n):
            shared = set(w[a]) & set(w[b])
            if not shared:
                continue
            dot = sum(w[a][t] * w[b][t] for t in shared)
            na = sum(v * v for v in w[a].values())
            nb = sum(v * v for v in w[b].values())
            want[(a, b)] = round(dot / (math.sqrt(na) * math.sqrt(nb)), 6)
    assert got == want
