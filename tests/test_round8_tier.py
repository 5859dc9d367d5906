"""Hand-computed / brute-force invariant tests for the round-8 pipeline
tier (queries_pipeline.py). Cross-engine value parity runs separately for
every query at both SFs in tests/test_oracle_parity.py; these tests pin
the SEMANTICS against independent Python recomputations."""

from __future__ import annotations

import math
from collections import defaultdict

import pytest

from py_datalake_move_files_spark.catalog import load_table
from py_datalake_move_files_spark.queries import QUERIES

SF_SMALL = "/root/testdata/sf0.001"


# --------------------------------------------------------------------------
# cumulative_distinct_users
# --------------------------------------------------------------------------


def test_cumulative_distinct_users_matches_running_set(spark):
    """The first-touch rewrite must equal the naive running-distinct-set
    fold over the raw events (the thing it exists to avoid computing)."""
    ev = load_table(spark, SF_SMALL, "events").select("user_id", "ts").collect()
    by_day = defaultdict(set)
    for r in ev:
        by_day[r["ts"].date()].add(r["user_id"])
    seen: set = set()
    want = {}
    for d in sorted(by_day):
        before = len(seen)
        seen |= by_day[d]
        want[d] = (len(seen) - before, len(seen))
    got = {
        r["day"]: (r["new_users"], r["cum_users"])
        for r in QUERIES["cumulative_distinct_users"](spark, SF_SMALL).collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# event_order_violations
# --------------------------------------------------------------------------


def test_order_violations_match_sequential_scan(spark):
    ev = (
        load_table(spark, SF_SMALL, "events")
        .select("user_id", "event_id", "ts")
        .collect()
    )
    per_user = defaultdict(list)
    for r in ev:
        per_user[r["user_id"]].append((r["event_id"], r["ts"]))
    want = {}
    for u, rows in per_user.items():
        rows.sort()
        mx, viol = None, 0
        for _, ts in rows:
            if mx is not None and ts < mx:
                viol += 1
            mx = ts if mx is None or ts > mx else mx
        want[u] = (len(rows), viol, viol * 1_000_000 // len(rows))
    got = {
        r["user_id"]: (r["n_events"], r["n_violations"], r["violation_ppm"])
        for r in QUERIES["event_order_violations"](spark, SF_SMALL).collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# partition_compaction_plan
# --------------------------------------------------------------------------


def test_compaction_bins_are_contiguous_and_complete(spark):
    rows = sorted(
        QUERIES["partition_compaction_plan"](spark, SF_SMALL).collect(),
        key=lambda r: r["bin_id"],
    )
    ev = load_table(spark, SF_SMALL, "events")
    assert sum(r["n_rows"] for r in rows) == ev.count()
    # contiguous, non-overlapping day ranges in bin order
    for a, b in zip(rows, rows[1:]):
        assert a["day_last"] < b["day_first"]
    # bin boundaries follow the prefix-sum rule: a new bin starts exactly
    # when the running count of PRIOR days crosses a 4096 multiple
    daily = sorted(
        (r["ts"].date(), 1)
        for r in ev.select("ts").collect()
    )
    counts = defaultdict(int)
    for d, _ in daily:
        counts[d] += 1
    cum = 0
    want_bins = defaultdict(lambda: [0, None, None])
    for d in sorted(counts):
        b = cum // 4096
        wb = want_bins[b]
        wb[0] += counts[d]
        wb[1] = wb[1] or d
        wb[2] = d
        cum += counts[d]
    got = {
        r["bin_id"]: [r["n_rows"], r["day_first"], r["day_last"]]
        for r in rows
    }
    assert got == dict(want_bins)


# --------------------------------------------------------------------------
# token_budget_waterfill
# --------------------------------------------------------------------------


def test_waterfill_exhausts_budget_within_group_count(spark):
    """Water-filling invariants: (1) alloc ≤ cap everywhere; (2) unclipped
    pools keep everything; (3) clipped pools share one common level;
    (4) the total allocation is within |pools| tokens of the budget
    (integer level flooring loses < 1 token per unclipped pool);
    (5) the allocation equals the independent Python water-fill."""
    rows = QUERIES["token_budget_waterfill"](spark, SF_SMALL).collect()
    caps = {(r["lang"], r["source"]): r["cap_tokens"] for r in rows}
    total = sum(caps.values())
    budget = total // 2
    # independent water-fill
    order = sorted(caps.items(), key=lambda kv: (kv[1], kv[0]))
    g = len(order)
    pk, kstar, pkstar = 0, 0, 0
    for k, (_, cap) in enumerate(order, start=1):
        pk += cap
        if pk + (g - k) * cap <= budget:
            kstar, pkstar = k, pk
    lvl = (budget - pkstar) // (g - kstar) if kstar < g else max(caps.values())
    want = {key: min(cap, lvl) for key, cap in caps.items()}
    got = {(r["lang"], r["source"]): r["alloc_tokens"] for r in rows}
    assert got == want
    for r in rows:
        assert r["alloc_tokens"] <= r["cap_tokens"]
        assert r["fully_funded"] == (r["cap_tokens"] <= lvl)
    alloc_total = sum(got.values())
    assert alloc_total <= budget
    assert budget - alloc_total < g  # flooring loses < 1 token per pool


# --------------------------------------------------------------------------
# jackknife_mean_quality
# --------------------------------------------------------------------------


def test_jackknife_identities(spark):
    """Pseudo-value identity: mean of pseudo-values weighted equally over
    groups reconstructs ~g·θ̂−(g−1)·mean(θ₍ᵢ₎); influence sign must match
    whether the source's mean is above or below the corpus mean."""
    docs = load_table(spark, SF_SMALL, "documents").select(
        "source", "n_chars"
    ).collect()
    n_tot = len(docs)
    s_tot = sum(r["n_chars"] for r in docs)
    per = defaultdict(lambda: [0, 0])
    for r in docs:
        per[r["source"]][0] += 1
        per[r["source"]][1] += r["n_chars"]
    rows = QUERIES["jackknife_mean_quality"](spark, SF_SMALL).collect()
    assert {r["source"] for r in rows} == set(per)
    for r in rows:
        n, t = per[r["source"]]
        assert r["n_docs"] == n
        loo = (s_tot - t) / (n_tot - n)
        assert r["loo_mean"] == pytest.approx(round(loo, 6), abs=1e-9)
        # influence positive iff removing the source LOWERS the mean,
        # i.e. the source is above-average
        src_mean = t / n
        corpus_mean = s_tot / n_tot
        if abs(src_mean - corpus_mean) > 1e-6:
            assert (r["influence_micro"] > 0) == (src_mean > corpus_mean)


# --------------------------------------------------------------------------
# markov_two_step_reach
# --------------------------------------------------------------------------


def test_markov_square_matches_python_matrix(spark):
    ev = (
        load_table(spark, SF_SMALL, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    per_user = defaultdict(list)
    for r in ev:
        per_user[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    c = defaultdict(int)
    for rows in per_user.values():
        rows.sort()
        for (_, _, a), (_, _, b) in zip(rows, rows[1:]):
            c[(a, b)] += 1
    ra = defaultdict(int)
    for (a, _), n in c.items():
        ra[a] += n
    want = {}
    for (a, b), cab in c.items():
        for (b2, d), cbd in c.items():
            if b2 != b:
                continue
            k = (a, d)
            paths, micro = want.get(k, (0, 0))
            want[k] = (
                paths + cab * cbd,
                micro + round(1_000_000.0 * ((cab * cbd) / (ra[a] * ra[b]))),
            )
    got = {
        (r["src"], r["dst"]): (r["n_paths"], r["p2_micro"])
        for r in QUERIES["markov_two_step_reach"](spark, SF_SMALL).collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# elasticity_by_segment
# --------------------------------------------------------------------------


def test_elasticity_matches_python_ols(spark):
    li = load_table(spark, SF_SMALL, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_quantity"
    )
    o = load_table(spark, SF_SMALL, "orders").select("o_orderkey", "o_custkey")
    cu = load_table(spark, SF_SMALL, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(cu, o.o_custkey == cu.c_custkey)
        .select("c_mktsegment", "l_extendedprice", "l_quantity")
        .collect()
    )
    pts = defaultdict(list)
    for r in joined:
        xm = round(1_000_000 * math.log(round(r["l_extendedprice"] * 100)))
        ym = round(1_000_000 * math.log(r["l_quantity"]))
        pts[r["c_mktsegment"]].append((xm, ym))
    rows = {
        r["segment"]: r
        for r in QUERIES["elasticity_by_segment"](spark, SF_SMALL).collect()
    }
    assert set(rows) == set(pts)
    for seg, xy in pts.items():
        nn = float(len(xy))
        sx = float(sum(x for x, _ in xy))
        sy = float(sum(y for _, y in xy))
        sxx = float(sum(x * x for x, _ in xy))
        sxy = float(sum(x * y for x, y in xy))
        slope = (nn * sxy - sx * sy) / (nn * sxx - sx * sx)
        assert rows[seg]["n_items"] == len(xy)
        assert rows[seg]["elasticity"] == pytest.approx(slope, abs=2e-6)


# --------------------------------------------------------------------------
# simplified_silhouette
# --------------------------------------------------------------------------


def test_silhouette_matches_python_recount(spark):
    emb = load_table(spark, SF_SMALL, "embeddings").select(
        "vec_id", "label", "embedding"
    ).collect()
    cent_q = defaultdict(lambda: None)
    n_lab = defaultdict(int)
    for r in emb:
        q = [round(float(v) * 1_000_000) for v in r["embedding"]]
        if cent_q[r["label"]] is None:
            cent_q[r["label"]] = q
        else:
            cent_q[r["label"]] = [a + b for a, b in zip(cent_q[r["label"]], q)]
        n_lab[r["label"]] += 1
    cents = {
        lab: [s / (n_lab[lab] * 1_000_000.0) for s in sq]
        for lab, sq in cent_q.items()
    }

    def cos(a, b):
        d = sum(float(x) * float(y) for x, y in zip(a, b))
        na = math.sqrt(sum(float(x) * float(x) for x in a))
        nb = math.sqrt(sum(float(y) * float(y) for y in b))
        return round(d / (na * nb), 6)

    agg = defaultdict(lambda: [0, 0, 0])  # n, sum_micro, n_neg
    for r in emb:
        own = cos(r["embedding"], cents[r["label"]])
        other = max(
            cos(r["embedding"], cv)
            for lab, cv in cents.items()
            if lab != r["label"]
        )
        a, b = 1.0 - own, 1.0 - other
        s_micro = round(1_000_000 * ((b - a) / max(a, b)))
        g = agg[r["label"]]
        g[0] += 1
        g[1] += s_micro
        g[2] += 1 if s_micro < 0 else 0
    rows = {
        r["label"]: r
        for r in QUERIES["simplified_silhouette"](spark, SF_SMALL).collect()
    }
    assert set(rows) == set(agg)
    for lab, (n, sm, neg) in agg.items():
        assert rows[lab]["n_vecs"] == n
        assert rows[lab]["n_negative"] == neg
        assert rows[lab]["mean_silhouette"] == pytest.approx(
            round(sm / (n * 1_000_000.0), 6), abs=2e-6
        )


# --------------------------------------------------------------------------
# ql_dirichlet_retrieval
# --------------------------------------------------------------------------


def test_ql_scores_match_python_lm(spark):
    from py_datalake_move_files_spark.queries_pipeline import QL_TERMS, QL_TOPK

    docs = load_table(spark, SF_SMALL, "documents").select(
        "doc_id", "text"
    ).collect()
    toks = {r["doc_id"]: r["text"].split(" ") for r in docs}
    coll = sum(len(t) for t in toks.values())
    cf = {t: sum(tok.count(t) for tok in toks.values()) for t in QL_TERMS}
    mu = 2000.0

    def score(did):
        s = None
        dl = len(toks[did])
        for t in QL_TERMS:
            term = math.log(
                (toks[did].count(t) + mu * (cf[t] / coll)) / (dl + mu)
            )
            s = term if s is None else s + term
        return round(s, 6)

    want = sorted(
        ((score(d), d) for d in toks), key=lambda x: (-x[0], x[1])
    )[:QL_TOPK]
    got = sorted(
        QUERIES["ql_dirichlet_retrieval"](spark, SF_SMALL).collect(),
        key=lambda r: r["rnk"],
    )
    assert [(r["score"], r["doc_id"]) for r in got] == [
        (pytest.approx(s, abs=2e-6), d) for s, d in want
    ]


# --------------------------------------------------------------------------
# winnowing_fingerprints
# --------------------------------------------------------------------------


def _py_winnow(text: str):
    import hashlib

    toks = text.split(" ")
    if len(toks) < 3:
        grams = [text]
    else:
        grams = [
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        ]
    gh = [
        int(hashlib.md5(g.encode()).hexdigest()[:12], 16) for g in grams
    ]
    if len(gh) <= 4:
        sel = [min(gh)]
    else:
        sel = [min(gh[i : i + 4]) for i in range(len(gh) - 3)]
    fps = list(dict.fromkeys(sel))
    return len(gh), fps


def test_winnowing_matches_python_and_covers_every_window(spark):
    docs = load_table(spark, SF_SMALL, "documents").select(
        "doc_id", "text"
    ).collect()
    rows = {
        r["doc_id"]: r
        for r in QUERIES["winnowing_fingerprints"](spark, SF_SMALL).collect()
    }
    assert set(rows) == {r["doc_id"] for r in docs}
    for r in docs:
        n_grams, fps = _py_winnow(r["text"])
        got = rows[r["doc_id"]]
        assert got["n_grams"] == n_grams
        assert got["n_fps"] == len(set(fps))
        assert got["fp_checksum"] == sum(set(fps))
        assert got["min_fp"] == min(fps)
        # the winnowing guarantee: every 4-gram window contains at least
        # one selected fingerprint
        fpset = set(fps)
        _, all_hashes = n_grams, None  # readability
        # recompute hashes to check coverage
        import hashlib

        toks = r["text"].split(" ")
        grams = (
            [r["text"]]
            if len(toks) < 3
            else [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
        )
        gh = [
            int(hashlib.md5(g.encode()).hexdigest()[:12], 16) for g in grams
        ]
        for i in range(max(1, len(gh) - 3)):
            assert fpset & set(gh[i : i + 4]), "window without fingerprint"


# --------------------------------------------------------------------------
# mmr_rerank_retrieval
# --------------------------------------------------------------------------


def test_mmr_matches_python_greedy(spark):
    """Full Python re-derivation: BM25 scores → top-20 candidates →
    integer token-Jaccard ppm → greedy λ·rel − (1−λ)·max-sim selection
    with doc_id tie-breaks, step by step."""
    from py_datalake_move_files_spark.queries_pipeline import (
        MMR_CANDIDATES,
        MMR_K,
        MMR_LAMBDA,
        _MMR_TERMS,
    )

    docs = load_table(spark, SF_SMALL, "documents").select(
        "doc_id", "text"
    ).collect()
    toks = {r["doc_id"]: r["text"].split(" ") for r in docs}
    n_docs = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n_docs
    df = {
        t: sum(1 for tok in toks.values() if t in tok) for t in _MMR_TERMS
    }

    def bm25(did):
        s = None
        dl = len(toks[did])
        for t in _MMR_TERMS:
            tf = toks[did].count(t)
            idf = math.log((n_docs - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            term = idf * (tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * (dl / avgdl)))
            s = term if s is None else s + term
        return round(s, 6)

    cand = sorted(
        ((bm25(d), d) for d in toks), key=lambda x: (-x[0], x[1])
    )[:MMR_CANDIDATES]
    rel = {d: s for s, d in cand}
    sets = {d: set(toks[d]) for d in rel}

    def jppm(a, b):
        return len(sets[a] & sets[b]) * 1_000_000 // len(sets[a] | sets[b])

    selected = []
    first = max(rel, key=lambda d: (rel[d], -d))  # max rel, min doc_id tie
    first = sorted(rel, key=lambda d: (-rel[d], d))[0]
    selected.append((first, rel[first]))
    while len(selected) < MMR_K:
        best = None
        for d in rel:
            if any(d == s for s, _ in selected):
                continue
            ms = max(jppm(d, s) for s, _ in selected)
            score = round(
                MMR_LAMBDA * rel[d] - round(1 - MMR_LAMBDA, 10) * (ms / 1_000_000.0), 6
            )
            if best is None or (score, -d) > (best[1], -best[0]):
                best = (d, score)
        selected.append(best)
    got = sorted(
        QUERIES["mmr_rerank_retrieval"](spark, SF_SMALL).collect(),
        key=lambda r: r["rnk"],
    )
    assert [(r["doc_id"], r["mmr_score"]) for r in got] == [
        (d, pytest.approx(s, abs=2e-6)) for d, s in selected
    ]


# --------------------------------------------------------------------------
# consistent_hash_shards
# --------------------------------------------------------------------------


def test_hrw_matches_python_and_minimal_disruption(spark):
    """Per-doc argmax recount, plus the rendezvous property that justifies
    the operator: dropping one shard moves ONLY that shard's documents
    (every other document keeps its argmax)."""
    import hashlib

    from py_datalake_move_files_spark.queries_pipeline import N_SHARDS

    docs = load_table(spark, SF_SMALL, "documents").select("doc_id").collect()

    def weights(did, n):
        return [
            hashlib.md5(f"{did}:{s}".encode()).hexdigest() for s in range(n)
        ]

    want = {}
    for r in docs:
        hs = weights(r["doc_id"], N_SHARDS)
        want[r["doc_id"]] = hs.index(max(hs))
    got = {
        r["doc_id"]: r["shard"]
        for r in QUERIES["consistent_hash_shards"](spark, SF_SMALL).collect()
    }
    assert got == want
    # minimal disruption: recompute with the LAST shard removed
    for did, shard in want.items():
        hs = weights(did, N_SHARDS - 1)
        new_shard = hs.index(max(hs))
        if shard != N_SHARDS - 1:
            assert new_shard == shard, "survivor document moved"


# --------------------------------------------------------------------------
# quantile_normalize_lengths
# --------------------------------------------------------------------------


def test_quantile_normalization_matches_python(spark):
    """Recount: each doc's within-source rank maps to the pooled sorted
    value at ceil(rn*N/ns); after normalization every source's value
    multiset is a nearest-rank resample of the pooled distribution."""
    docs = load_table(spark, SF_SMALL, "documents").select(
        "doc_id", "source", "n_chars"
    ).collect()
    pooled = sorted(r["n_chars"] for r in docs)
    nn = len(pooled)
    per = defaultdict(list)
    for r in docs:
        per[r["source"]].append((r["n_chars"], r["doc_id"]))
    want = {}
    for src, rows in per.items():
        rows.sort()
        ns = len(rows)
        for rn, (_, did) in enumerate(rows, start=1):
            idx = (rn * nn + ns - 1) // ns  # 1-based pooled index
            want[did] = pooled[idx - 1]
    got = {
        r["doc_id"]: r["norm_chars"]
        for r in QUERIES["quantile_normalize_lengths"](spark, SF_SMALL).collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# prf_query_expansion
# --------------------------------------------------------------------------


def test_prf_expansion_matches_python_rm1(spark):
    from py_datalake_move_files_spark.queries_pipeline import (
        PRF_FEEDBACK_DOCS,
        PRF_TOPK,
        _MMR_TERMS,
    )

    docs = load_table(spark, SF_SMALL, "documents").select(
        "doc_id", "text"
    ).collect()
    toks = {r["doc_id"]: r["text"].split(" ") for r in docs}
    n_docs = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n_docs
    df = {t: sum(1 for tok in toks.values() if t in tok) for t in _MMR_TERMS}

    def bm25(did):
        s = None
        dl = len(toks[did])
        for t in _MMR_TERMS:
            tf = toks[did].count(t)
            idf = math.log((n_docs - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            term = idf * (tf * 2.2) / (
                tf + 1.2 * (1.0 - 0.75 + 0.75 * (dl / avgdl))
            )
            s = term if s is None else s + term
        return round(s, 6)

    fb = [
        d
        for _, d in sorted(
            ((bm25(d), d) for d in toks), key=lambda x: (-x[0], x[1])
        )[:PRF_FEEDBACK_DOCS]
    ]
    weights = defaultdict(int)
    for d in fb:
        dl = len(toks[d])
        tf = defaultdict(int)
        for t in toks[d]:
            if t:
                tf[t] += 1
        for t, c in tf.items():
            if t not in _MMR_TERMS:
                weights[t] += round(1_000_000.0 * (c / dl))
    want = sorted(weights.items(), key=lambda kv: (-kv[1], kv[0]))[:PRF_TOPK]
    got = sorted(
        QUERIES["prf_query_expansion"](spark, SF_SMALL).collect(),
        key=lambda r: r["rnk"],
    )
    assert [(r["token"], r["weight_micro"]) for r in got] == want


# --------------------------------------------------------------------------
# seasonal_naive_backtest
# --------------------------------------------------------------------------


def test_seasonal_naive_backtest_matches_python(spark):
    import datetime as dt

    ev = load_table(spark, SF_SMALL, "events").select("ts").collect()
    daily = defaultdict(int)
    for r in ev:
        daily[r["ts"].date()] += 1
    anchor = dt.date(2024, 1, 1)
    agg = defaultdict(lambda: [0, 0, 0])  # n, actual, abs_err
    for d, c in daily.items():
        prev = d - dt.timedelta(days=7)
        if prev in daily:
            dow = ((d - anchor).days % 7 + 7) % 7
            g = agg[dow]
            g[0] += 1
            g[1] += c
            g[2] += abs(c - daily[prev])
    rows = {
        r["dow_idx"]: r
        for r in QUERIES["seasonal_naive_backtest"](spark, SF_SMALL).collect()
    }
    assert set(rows) == set(agg)
    for dow, (n, ta, tae) in agg.items():
        r = rows[dow]
        assert (r["n_days"], r["total_actual"], r["total_abs_err"]) == (
            n, ta, tae,
        )
        assert r["wape_ppm"] == tae * 1_000_000 // ta


# --------------------------------------------------------------------------
# readability_scores
# --------------------------------------------------------------------------


def test_readability_matches_python(spark):
    import re

    docs = load_table(spark, SF_SMALL, "documents").select(
        "doc_id", "text"
    ).collect()
    rows = {
        r["doc_id"]: r
        for r in QUERIES["readability_scores"](spark, SF_SMALL).collect()
    }
    for r in docs:
        t = r["text"]
        w = len(t.split(" "))
        s = max(1, t.count("."))
        sy = max(1, len(re.findall(r"[aeiouyAEIOUY]+", t)))
        got = rows[r["doc_id"]]
        assert (got["n_words"], got["n_sentences"], got["n_syllables"]) == (
            w, s, sy,
        )
        assert got["flesch"] == pytest.approx(
            round(206.835 - 1.015 * (w / s) - 84.6 * (sy / w), 4), abs=2e-4
        )


# --------------------------------------------------------------------------
# ctr_wilson_bounds
# --------------------------------------------------------------------------


def test_wilson_bounds_match_python_and_bracket_p(spark):
    o = load_table(spark, SF_SMALL, "orders").select(
        "o_orderpriority", "o_orderstatus"
    ).collect()
    agg = defaultdict(lambda: [0, 0])
    for r in o:
        g = agg[r["o_orderpriority"]]
        g[0] += 1
        g[1] += 1 if r["o_orderstatus"] == "F" else 0
    rows = {
        r["o_orderpriority"]: r
        for r in QUERIES["ctr_wilson_bounds"](spark, SF_SMALL).collect()
    }
    z = 1.96
    for pri, (n, k) in agg.items():
        r = rows[pri]
        assert (r["n_orders"], r["n_filled"]) == (n, k)
        p = k / n
        denom = 1.0 + z * z / n
        center = p + z * z / (2.0 * n)
        half = z * math.sqrt(p * (1.0 - p) / n + z * z / (4.0 * n * n))
        assert r["wilson_lo"] == pytest.approx(
            round((center - half) / denom, 6), abs=2e-6
        )
        assert r["wilson_hi"] == pytest.approx(
            round((center + half) / denom, 6), abs=2e-6
        )
        # the interval must bracket p-hat and stay inside [0, 1]
        assert 0.0 <= r["wilson_lo"] <= round(p, 6) <= r["wilson_hi"] <= 1.0
