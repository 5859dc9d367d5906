"""Behavioral unit tests for dedup / similarity / as-of operators on crafted
inputs (the oracle-parity suite covers the harness tables; these pin the
semantics on controlled corners)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from py_datalake_move_files_spark.operators.asof import asof_join, range_join
from py_datalake_move_files_spark.operators.dedup import (
    dedup_exact,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    simhash,
)
from py_datalake_move_files_spark.operators.similarity import brute_force_topk


def test_dedup_exact_keeps_min_id(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (5, "same text"), (3, "other")], ["doc_id", "text"]
    )
    rows = {r.keep_id: r.n_copies for r in dedup_exact(df, "doc_id").collect()}
    assert rows == {1: 2, 3: 1}


def test_minhash_lsh_finds_exact_dup_pair(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, "totally different words here now ok yes")],
        ["doc_id", "text"],
    )
    sigs = minhash_signatures(df, "doc_id")
    cands = lsh_candidate_pairs(sigs, "doc_id")
    pairs = {(r.id_a, r.id_b) for r in cands.collect()}
    assert (1, 2) in pairs
    verified = jaccard_pairs(df, "doc_id", threshold=0.99, candidates=cands).collect()
    assert [(v.id_a, v.id_b, v.jaccard) for v in verified] == [(1, 2, 1.0)]


def test_jaccard_inverted_index_no_candidates(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e g"), (3, "z y x w v u")],
        ["doc_id", "text"],
    )
    got = {(r.id_a, r.id_b): r.jaccard for r in jaccard_pairs(df, "doc_id", threshold=0.1).collect()}
    # docs 1,2: shingles {abc,bcd,cde,def} vs {abc,bcd,cde,deg}: 3/5
    assert got == {(1, 2): 0.6}


def test_simhash_identical_tokens_collide(spark):
    df = spark.createDataFrame(
        [(1, "w1 w2 w3"), (2, "w3 w2 w1"), (3, "entirely different tokens")],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r.simhash for r in simhash(df, "doc_id").collect()}
    assert rows[1] == rows[2]  # order-insensitive token multiset
    assert rows[1] != rows[3]


def test_brute_force_topk_orders_by_cosine(spark):
    vecs = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),   # closest to 0
        (2, [0.0, 1.0, 0.0]),   # orthogonal
        (3, [0.5, 0.5, 0.0]),
    ]
    corpus = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    queries = corpus.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = brute_force_topk(corpus, queries, k=2).orderBy("rnk").collect()
    assert [r.neighbor_id for r in got] == [1, 3]
    assert got[0].cosine_sim > got[1].cosine_sim > 0


def test_asof_join_backward_inclusive(spark):
    left = spark.createDataFrame(
        [
            ("u1", dt.datetime(2024, 1, 1, 10, 0), "p1"),
            ("u1", dt.datetime(2024, 1, 1, 12, 0), "p2"),
            ("u2", dt.datetime(2024, 1, 1, 9, 0), "p3"),  # no prior right row
        ],
        ["user", "ts", "pid"],
    )
    right = spark.createDataFrame(
        [
            ("u1", dt.datetime(2024, 1, 1, 9, 30), "v1"),
            ("u1", dt.datetime(2024, 1, 1, 10, 0), "v2"),   # ties left p1 exactly
            ("u1", dt.datetime(2024, 1, 1, 11, 0), "v3"),
            ("u2", dt.datetime(2024, 1, 1, 9, 30), "v4"),   # after p3
        ],
        ["user", "ts", "vid"],
    )
    out = {
        r.pid: r.asof_vid
        for r in asof_join(
            left, right, on="user", left_ts="ts", right_ts="ts", right_cols=["vid"]
        ).collect()
    }
    assert out == {"p1": "v2", "p2": "v3", "p3": None}  # inclusive <=, latest prior


def test_range_join_buckets(spark):
    facts = spark.createDataFrame([(5.0,), (15.0,), (150.0,)], ["v"])
    iv = spark.createDataFrame(
        [("lo", 0.0, 10.0), ("mid", 10.0, 100.0), ("hi", 100.0, 1e9)],
        ["label", "lo", "hi"],
    )
    got = {
        r.v: r.label
        for r in range_join(facts, iv, point_col="v", start_col="lo", end_col="hi").collect()
    }
    assert got == {5.0: "lo", 15.0: "mid", 150.0: "hi"}


def test_asof_join_forward_and_tolerance(spark):
    left = spark.createDataFrame(
        [("u1", dt.datetime(2024, 1, 1, 10, 0), "p1")], ["user", "ts", "pid"]
    )
    right = spark.createDataFrame(
        [
            ("u1", dt.datetime(2024, 1, 1, 9, 0), "before"),
            ("u1", dt.datetime(2024, 1, 1, 10, 30), "after30m"),
            ("u1", dt.datetime(2024, 1, 1, 12, 0), "after2h"),
        ],
        ["user", "ts", "vid"],
    )
    fwd = asof_join(
        left, right, on="user", left_ts="ts", right_ts="ts",
        right_cols=["vid"], direction="forward",
    ).first()
    assert fwd.asof_vid == "after30m"  # earliest AT-or-after

    tight = asof_join(
        left, right, on="user", left_ts="ts", right_ts="ts",
        right_cols=["vid"], direction="forward", tolerance_ms=10 * 60 * 1000,
    ).first()
    assert tight.asof_vid is None  # nearest forward match is 30m away

    back_tol = asof_join(
        left, right, on="user", left_ts="ts", right_ts="ts",
        right_cols=["vid"], direction="backward", tolerance_ms=2 * 3600 * 1000,
    ).first()
    assert back_tol.asof_vid == "before"


def test_incremental_dedup_statuses_and_keeper(spark):
    from py_datalake_move_files_spark.operators.dedup import incremental_dedup

    index = spark.createDataFrame([("k1",), ("k2",)], "digest string")
    batch = spark.createDataFrame(
        [(10, "k1"), (11, "k3"), (12, "k3"), (13, "k4"), (14, "k3")],
        "id long, digest string",
    )
    out = {
        r["id"]: r["status"]
        for r in incremental_dedup(batch, index, "id").collect()
    }
    assert out == {
        10: "dup_of_index",  # key already in the standing index
        11: "unique",  # min-id keeper of the new k3 group
        12: "dup_in_batch",
        14: "dup_in_batch",
        13: "unique",
    }


def test_containment_pairs_finds_embedded_doc(spark):
    """A doc fully embedded in a longer one: containment 1.0 while Jaccard
    stays low — the asymmetric case the operator exists for. Hand-computed
    on 3-shingle sets."""
    from py_datalake_move_files_spark.operators.dedup import containment_pairs

    small = "a b c d e"                       # shingles: abc bcd cde (3)
    big = small + " f g h i j k l m n"        # 12 shingles, contains all 3
    other = "zz yy xx ww vv"                  # disjoint
    df = spark.createDataFrame(
        [(1, small), (2, big), (3, other)], "doc_id long, text string"
    )
    rows = {(r["id_a"], r["id_b"]): r for r in
            containment_pairs(df, "doc_id", threshold=0.8).collect()}
    assert set(rows) == {(1, 2)}
    r = rows[(1, 2)]
    assert r["containment"] == 1.0
    assert r["jaccard"] == 0.25  # 3 / (3 + 12 - 3)


def test_containment_pairs_threshold_excludes_partial(spark):
    from py_datalake_move_files_spark.operators.dedup import containment_pairs

    # doc1 shingles {abc, bcd}; doc2 {bcd, cde, def}: intersection {bcd}
    # -> containment 1/min(2,3) = 0.5 < 0.8
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "b c d e f")], "doc_id long, text string"
    )
    assert containment_pairs(df, "doc_id", threshold=0.8).count() == 0
    out = containment_pairs(df, "doc_id", threshold=0.4).collect()
    assert len(out) == 1 and out[0]["containment"] == 0.5
    assert out[0]["jaccard"] == 0.25  # 1 / (2 + 3 - 1)


def test_containment_pairs_max_df_bounds_hot_shingle_candidates(spark):
    """Skewed fixture (VERDICT r5 #2): ONE boilerplate shingle shared by
    every document. Uncapped, the posting self-join yields N·(N-1)/2
    candidate pairs from that shingle alone; with ``max_df`` the hot
    shingle is excluded from candidate generation, so hot-only pairs
    vanish while genuinely contained pairs keep EXACT full-set scores."""
    from py_datalake_move_files_spark.operators.dedup import containment_pairs

    n = 6
    # every doc ends in the boilerplate trigram "x y z" (df = n) but is
    # otherwise unique -> each boilerplate pair shares ONLY the hot shingle
    boiler = [(i, f"u{i} v{i} w{i} x y z") for i in range(n)]
    # plus a true containment pair sharing 3 RARE shingles (df = 2 <= cap)
    small = (100, "a b c d e")           # shingles abc bcd cde
    big = (101, "a b c d e f g h")       # + def efg fgh; contains all 3
    df = spark.createDataFrame(
        boiler + [small, big], "doc_id long, text string"
    )

    capped = containment_pairs(df, "doc_id", threshold=0.2, max_df=3)
    rows = {(r["id_a"], r["id_b"]): r for r in capped.collect()}
    # the hot-only boilerplate pairs are gone; the real pair survives with
    # the exact uncapped score (re-scored over FULL shingle sets)
    assert set(rows) == {(100, 101)}
    assert rows[(100, 101)]["containment"] == 1.0
    assert rows[(100, 101)]["jaccard"] == 0.5  # 3 / (3 + 6 - 3)

    # the uncapped path DOES emit the n*(n-1)/2 hot-only pairs at this
    # threshold (containment 1/4 >= 0.2) — the quadratic blowup the cap
    # removes from candidate generation
    uncapped = containment_pairs(df, "doc_id", threshold=0.2)
    assert uncapped.count() == n * (n - 1) // 2 + 1

    # candidate-count bound, computed from the same df-cap device the
    # operator uses: with the cap, only the 3 df=2 shingles generate
    # candidates -> exactly 1 distinct pair (vs 16 uncapped)
    from collections import Counter

    shingle_sets = {
        i: {" ".join(t.split()[j : j + 3]) for j in range(len(t.split()) - 2)}
        for i, t in boiler + [small, big]
    }
    dfreq = Counter(s for ss in shingle_sets.values() for s in ss)
    cand_capped = {
        (a, b)
        for a in shingle_sets
        for b in shingle_sets
        if a < b
        and shingle_sets[a]
        & shingle_sets[b]
        & {s for s, d in dfreq.items() if 1 < d <= 3}
    }
    assert cand_capped == {(100, 101)}


def test_bigram_lm_scores_oov_and_buckets(spark):
    """Hand-computed: model 'a b b c' has bigrams {a b:1, b b:1, b c:1};
    scoring doc 'a b x y' has bigrams [a b, b x, x y] -> one seen (count 1,
    log2 bucket 0), two OOV."""
    from py_datalake_move_files_spark.operators.text import bigram_lm_scores

    ref = spark.createDataFrame([(0, "a b b c")], "doc_id long, text string")
    inc = spark.createDataFrame(
        [(1, "a b x y"), (2, "z")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in bigram_lm_scores(inc, ref).collect()}
    assert set(rows) == {1}  # the 1-token doc emits no bigrams
    r = rows[1]
    assert r["n_bigrams"] == 3
    assert r["oov_frac"] == round(2 / 3, 6)
    assert r["mean_log2_bgfreq"] == 0.0  # seen bigram count=1 -> bucket 0


def test_bigram_lm_scores_bucket_growth(spark):
    """A bigram seen 4 times lands in log2 bucket 2 (length(bin(4))-1)."""
    from py_datalake_move_files_spark.operators.text import bigram_lm_scores

    ref = spark.createDataFrame(
        [(i, "a b") for i in range(4)], "doc_id long, text string"
    )
    inc = spark.createDataFrame([(9, "a b")], "doc_id long, text string")
    r = bigram_lm_scores(inc, ref).first()
    assert r["n_bigrams"] == 1 and r["oov_frac"] == 0.0
    assert r["mean_log2_bgfreq"] == 2.0


def test_bm25_matches_python_recomputation(spark):
    """The BM25 double chain recomputed in plain Python with the same
    associativity — guards the formula mirror (idf/tf/len normalization)
    the oracle relies on, on a corpus small enough to verify by hand."""
    import math

    from py_datalake_move_files_spark.operators.retrieval import (
        BM25_B,
        BM25_K1,
        bm25_score_sql,
    )
    from py_datalake_move_files_spark.queries_retrieval import BM25_TERMS
    from pyspark.sql import functions as F

    texts = {
        1: "spark merge vector spark",
        2: "merge merge merge other words here",
        3: "nothing relevant at all",
        4: "vector",
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    toks = df.withColumn("__toks", F.expr("split(text, ' ')"))
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
            for i, t in enumerate(BM25_TERMS)
        ],
    )
    perdoc = toks.select(
        "doc_id",
        F.size("__toks").cast("long").alias("dl"),
        *[
            F.expr(
                f"CAST(size(filter(__toks, bmx{i} -> bmx{i} = '{t}')) AS BIGINT)"
            ).alias(f"tf{i}")
            for i, t in enumerate(BM25_TERMS)
        ],
    )
    got = {
        r["doc_id"]: r["score"]
        for r in perdoc.crossJoin(F.broadcast(stats))
        .select("doc_id", F.expr(bm25_score_sql(len(BM25_TERMS))).alias("score"))
        .collect()
    }

    docs_toks = {i: t.split(" ") for i, t in texts.items()}
    n_docs = len(docs_toks)
    avgdl = sum(len(t) for t in docs_toks.values()) / float(n_docs)
    dfs = [sum(1 for t in docs_toks.values() if term in t) for term in BM25_TERMS]
    for i, tks in docs_toks.items():
        dl = len(tks)
        score = None
        for j, term in enumerate(BM25_TERMS):
            tf = tks.count(term)
            idf = math.log((float(n_docs) - dfs[j] + 0.5) / (dfs[j] + 0.5) + 1.0)
            piece = (idf) * (float(tf) * (BM25_K1 + 1.0)) / (
                float(tf) + BM25_K1 * (1.0 - BM25_B + BM25_B * (float(dl) / avgdl))
            )
            score = piece if score is None else score + piece
        assert got[i] == round(score, 6), (i, got[i], score)


def test_containment_pairs_candidates_branch_matches_inverted(spark):
    """The O(candidates) sketch-pruned branch must score identically to the
    inverted-index branch on the pairs it is given (same rounding, same
    min-size denominator)."""
    from py_datalake_move_files_spark.operators.dedup import containment_pairs

    small = "a b c d e"
    big = small + " f g h i j k l m n"
    df = spark.createDataFrame(
        [(1, small), (2, big), (3, "zz yy xx ww vv")], "doc_id long, text string"
    )
    full = {(r["id_a"], r["id_b"]): (r["containment"], r["jaccard"])
            for r in containment_pairs(df, "doc_id", threshold=0.5).collect()}
    cands = spark.createDataFrame([(1, 2), (1, 3)], "id_a long, id_b long")
    pruned = {(r["id_a"], r["id_b"]): (r["containment"], r["jaccard"])
              for r in containment_pairs(
                  df, "doc_id", threshold=0.5, candidates=cands
              ).collect()}
    assert pruned == full == {(1, 2): (1.0, 0.25)}


def test_multiprobe_recall_dominates_single_probe(spark):
    """Multi-probe's candidate pool is a strict superset of the home
    bucket's (probes include it), so recall@10 vs the exact baseline must
    be >= single-probe recall for every query — the property that makes
    it a recall dial and not just a different index."""
    from py_datalake_move_files_spark.catalog import load_table
    from py_datalake_move_files_spark.operators.similarity import (
        brute_force_topk,
        lsh_bucketed_topk,
        lsh_multiprobe_topk,
        recall_vs_exact,
    )

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = brute_force_topk(emb, queries, k=10)
    # 4 planes = 16 buckets over 500 vectors: recall is non-trivial for
    # both arms (8 planes shatters this corpus to ~2 vectors/bucket and
    # both recalls degenerate to 0, proving nothing)
    single = lsh_bucketed_topk(emb, queries, k=10, n_planes=4, dim=64)
    multi = lsh_multiprobe_topk(
        emb, queries, k=10, n_planes=4, dim=64, m_probes=2
    )
    r_single = {r["query_id"]: r["n_hits"]
                for r in recall_vs_exact(single, exact, queries, k=10).collect()}
    r_multi = {r["query_id"]: r["n_hits"]
               for r in recall_vs_exact(multi, exact, queries, k=10).collect()}
    assert set(r_single) == set(r_multi)
    for qid in r_single:
        assert r_multi[qid] >= r_single[qid], qid
    # and somewhere it actually buys recall on this corpus
    assert sum(r_multi.values()) > sum(r_single.values())


def test_sizes_broadcast_is_conditional_on_corpus_size(spark, monkeypatch):
    """VERDICT r5 #8: the per-document sizes side is broadcast only while
    provably small; above the threshold the SAME results come back through
    a plain co-partitioned join (per-doc sides grow with the corpus —
    ~12 GB at 1B docs — and must never be forced broadcast)."""
    from py_datalake_move_files_spark.operators import dedup as DD

    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),
            (2, "a b c d e f g h"),
            (3, "a b c d x"),
            (4, "zz yy xx ww vv"),
        ],
        "doc_id long, text string",
    )

    def run():
        return sorted(
            tuple(r)
            for r in DD.jaccard_pairs(
                docs, "doc_id", threshold=0.2
            ).collect()
        )

    # unit contract: _maybe_broadcast hints only under the threshold
    small = spark.createDataFrame([(1, 2)], "doc long, n_sh int")
    hinted = DD._maybe_broadcast(small, 10)._jdf.queryExecution()
    unhinted = DD._maybe_broadcast(small, 10**9)._jdf.queryExecution()
    unknown = DD._maybe_broadcast(small, None)._jdf.queryExecution()
    assert "ResolvedHint" in hinted.analyzed().toString()
    assert "ResolvedHint" not in unhinted.analyzed().toString()
    assert "ResolvedHint" not in unknown.analyzed().toString()

    # whole-operator: identical pairs through both branches
    via_broadcast = run()
    monkeypatch.setattr(DD, "BROADCAST_SIZES_MAX_DOCS", 0)
    via_plain_join = run()
    assert via_broadcast == via_plain_join and via_broadcast


def test_ql_retrieval_rejects_empty_terms(spark):
    """ADVICE r8: zero query terms must fail fast with a clear ValueError,
    not emit 'round(None, 6)' and die with an opaque parse error at
    execution time."""
    import pytest

    from py_datalake_move_files_spark.operators.retrieval import (
        ql_dirichlet_topk,
        ql_score_sql,
    )

    with pytest.raises(ValueError, match="at least one term"):
        ql_score_sql(0)
    docs = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="at least one term"):
        ql_dirichlet_topk(docs, ())
    with pytest.raises(ValueError, match="at least one term"):
        ql_dirichlet_topk(docs, [])
