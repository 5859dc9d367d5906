"""Hand-computed / brute-force invariant tests for the round-10
governance/measurement tier (queries_audit.py) and the two round-10 scale
variants. Cross-engine value parity runs separately for every query at
both SFs in tests/test_oracle_parity.py; these tests pin the SEMANTICS
against independent Python recomputations."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from py_datalake_move_files_spark.catalog import load_table
from py_datalake_move_files_spark.queries import QUERIES

SF_SMALL = "/root/testdata/sf0.001"


# --------------------------------------------------------------------------
# t_closeness_audit
# --------------------------------------------------------------------------


def test_t_closeness_matches_python_emd(spark):
    """Per-class t_ppm must equal a from-scratch EMD over ordered
    kilo-buckets computed with exact Python rationals."""
    cust = load_table(spark, SF_SMALL, "customer").collect()
    buckets = sorted({math.floor(r.c_acctbal / 1000.0) for r in cust})
    n_total = len(cust)
    gh = Counter(math.floor(r.c_acctbal / 1000.0) for r in cust)
    classes = defaultdict(list)
    for r in cust:
        classes[(r.c_nationkey, r.c_mktsegment)].append(
            math.floor(r.c_acctbal / 1000.0)
        )
    got = {
        (r.c_nationkey, r.c_mktsegment): r
        for r in QUERIES["t_closeness_audit"](spark, SF_SMALL).collect()
    }
    assert set(got) == set(classes)
    nb = len(buckets)
    for key, vals in classes.items():
        k = len(vals)
        chist = Counter(vals)
        cumc = cumg = 0
        sd = 0
        for b in buckets:
            cumc += chist.get(b, 0)
            cumg += gh[b]
            sd += abs(cumc * n_total - cumg * k)
        want_ppm = (
            0
            if nb <= 1
            else math.floor(sd * 1_000_000.0 / ((nb - 1) * k * n_total))
        )
        assert got[key].k == k
        assert got[key].t_ppm == want_ppm
        assert 0 <= got[key].t_ppm <= 1_000_000  # EMD of distributions ≤ 1


# --------------------------------------------------------------------------
# mann_whitney_u_events
# --------------------------------------------------------------------------


def test_mann_whitney_u_matches_brute_force_pairs(spark):
    """2·U from the histogram device must equal the O(n·m) pair count
    (2 per win, 1 per tie), and the effect size must be its normalized
    form."""
    ev = load_table(spark, SF_SMALL, "events").collect()
    a = [round(r.value * 1_000_000) for r in ev if r.event_type == "purchase"]
    b = [round(r.value * 1_000_000) for r in ev if r.event_type == "click"]
    u2 = sum(2 if x > y else (1 if x == y else 0) for x in a for y in b)
    row = QUERIES["mann_whitney_u_events"](spark, SF_SMALL).collect()[0]
    assert row.n_a == len(a) and row.n_b == len(b)
    assert row.u2_a == u2
    assert row.rank_biserial_ppm == math.floor(
        (float(u2) - float(len(a)) * float(len(b)))
        * 1_000_000.0
        / (float(len(a)) * float(len(b)))
    )
    assert -1_000_000 <= row.rank_biserial_ppm <= 1_000_000


# --------------------------------------------------------------------------
# bpe_merge_candidates
# --------------------------------------------------------------------------


def test_bpe_pairs_match_python_count(spark):
    """Top adjacent-pair counts must equal a direct Python pass over the
    corpus (occurrence-weighted, not type-weighted)."""
    docs = load_table(spark, SF_SMALL, "documents").collect()
    pair_occ = Counter()
    pair_types = Counter()
    wn = Counter(
        w for r in docs for w in r.text.split(" ") if w != ""
    )
    for w, n in wn.items():
        # pairs may repeat within a word: occurrences count each position
        pairs_here = [w[i : i + 2] for i in range(len(w) - 1)]
        for p in set(pairs_here):
            pair_types[p] += 1
        for p in pairs_here:
            pair_occ[p] += n
    got = QUERIES["bpe_merge_candidates"](spark, SF_SMALL).collect()
    want = sorted(pair_occ.items(), key=lambda kv: (-kv[1], kv[0]))[: len(got)]
    assert [(r.pair, r.n_occurrences) for r in got] == want
    for r in got:
        assert r.n_word_types == pair_types[r.pair]


def test_bpe_pair_work_is_vocab_sized(spark):
    """The pair explode must hang off the word-count AGGREGATE (vocab
    rows), not the raw token stream — the plan has exactly one aggregate
    BELOW the generate."""
    plan = QUERIES["bpe_merge_candidates"](
        spark, SF_SMALL
    )._jdf.queryExecution().executedPlan().toString()
    gen_pos = plan.find("Generate explode(transform")
    assert gen_pos != -1, plan[:2000]
    below = plan[gen_pos:]
    assert "HashAggregate" in below  # word-count agg feeds the explode


# --------------------------------------------------------------------------
# mattr_lexical_diversity
# --------------------------------------------------------------------------


def test_mattr_matches_python_sliding_windows(spark):
    from py_datalake_move_files_spark.queries_audit import _MATTR_W

    docs = load_table(spark, SF_SMALL, "documents").collect()
    got = {
        r.doc_id: r
        for r in QUERIES["mattr_lexical_diversity"](spark, SF_SMALL).collect()
    }
    checked = 0
    for r in docs:
        toks = [t for t in r.text.split(" ") if t != ""]
        n = len(toks)
        if n == 0:
            assert r.doc_id not in got
            continue
        if n < _MATTR_W:
            want = len(set(toks)) * 1_000_000 // n
        else:
            s = sum(
                len(set(toks[i : i + _MATTR_W]))
                for i in range(n - _MATTR_W + 1)
            )
            want = s * 1_000_000 // ((n - _MATTR_W + 1) * _MATTR_W)
        assert got[r.doc_id].n_tokens == n
        assert got[r.doc_id].mattr_ppm == want
        checked += 1
    assert checked > 0


# --------------------------------------------------------------------------
# decision_stump_quality
# --------------------------------------------------------------------------


def test_decision_stump_is_true_argmin(spark):
    """The emitted threshold must achieve the minimum weighted Gini over
    ALL candidate thresholds (brute force over distinct values)."""
    docs = load_table(spark, SF_SMALL, "documents").collect()
    pts = sorted((r.n_chars, 1 if r.lang == "en" else 0) for r in docs)
    nt = len(pts)
    pt = sum(lbl for _, lbl in pts)
    values = sorted({v for v, _ in pts})
    best = None
    for v in values:
        cl = sum(1 for x, _ in pts if x <= v)
        cp = sum(lbl for x, lbl in pts if x <= v)
        if cl == nt:
            continue
        imp = (
            2.0 * cp * (cl - cp) / cl
            + 2.0 * (pt - cp) * ((nt - cl) - (pt - cp)) / (nt - cl)
        ) / nt
        if best is None or (imp, v) < best:
            best = (imp, v)
    row = QUERIES["decision_stump_quality"](spark, SF_SMALL).collect()[0]
    assert row.threshold == best[1]
    assert abs(row.weighted_gini - round(best[0], 6)) < 1e-9
    assert row.weighted_gini <= row.baseline_gini + 1e-9  # a split never hurts
    assert row.n_left + row.n_right == nt
    assert row.pos_left + row.pos_right == pt


# --------------------------------------------------------------------------
# token_log_odds_langs
# --------------------------------------------------------------------------


def test_log_odds_sign_tracks_language_affinity(spark):
    """Tokens ranked for 'en' must actually be relatively more frequent
    in 'en' than 'de' (sign sanity), and z must match the Python chain."""
    docs = load_table(spark, SF_SMALL, "documents").collect()
    y1 = Counter()
    y2 = Counter()
    for r in docs:
        if r.lang not in ("en", "de"):
            continue
        tgt = y1 if r.lang == "en" else y2
        for t in r.text.split(" "):
            if t != "":
                tgt[t] += 1
    n1, n2 = sum(y1.values()), sum(y2.values())
    got = QUERIES["token_log_odds_langs"](spark, SF_SMALL).collect()
    assert got
    for r in got:
        a, b = y1[r.tok], y2[r.tok]
        assert (a, b) == (r.y1, r.y2)
        z = (
            math.log((a + 0.5) / (n1 - a + 0.5))
            - math.log((b + 0.5) / (n2 - b + 0.5))
        ) / math.sqrt(1.0 / (a + 0.5) + 1.0 / (b + 0.5))
        assert abs(r.z_score - round(z, 6)) < 1e-9
        # positive z ⇒ relatively more 'en'; negative ⇒ more 'de'
        if r.z_score > 0:
            assert a * (n2 + 1) >= b * n1 - n1  # loose rate comparison
        else:
            assert b > 0


# --------------------------------------------------------------------------
# chernoff_sample_size_plan
# --------------------------------------------------------------------------


def test_chernoff_plan_constants_and_caps(spark):
    from py_datalake_move_files_spark.queries_audit import (
        _CHERNOFF_DELTA,
        _CHERNOFF_EPS,
    )

    n_req = math.ceil(
        math.log(2.0 / _CHERNOFF_DELTA) / (2.0 * _CHERNOFF_EPS**2)
    )
    docs = load_table(spark, SF_SMALL, "documents").collect()
    sizes = Counter(r.source for r in docs)
    got = {r.source: r for r in QUERIES["chernoff_sample_size_plan"](
        spark, SF_SMALL
    ).collect()}
    assert set(got) == set(sizes)
    for src, n in sizes.items():
        r = got[src]
        assert r.n_required == n_req
        assert r.n_docs == n
        assert r.n_sampled == min(n, n_req)
        assert r.take_all == (n <= n_req)
        assert r.sampling_rate_ppm == min(n, n_req) * 1_000_000 // n


# --------------------------------------------------------------------------
# dataset_card_summary
# --------------------------------------------------------------------------


def test_dataset_card_values_match_direct_aggregates(spark):
    docs = load_table(spark, SF_SMALL, "documents").collect()
    card = {
        (r.section, r.metric): r.value
        for r in QUERIES["dataset_card_summary"](spark, SF_SMALL).collect()
    }
    assert card[("documents", "n_rows")] == str(len(docs))
    assert card[("documents", "n_langs")] == str(len({r.lang for r in docs}))
    top = sorted(
        Counter(r.lang for r in docs).items(), key=lambda kv: (-kv[1], kv[0])
    )[0][0]
    assert card[("documents", "top_lang")] == top
    assert card[("documents", "total_chars")] == str(
        sum(r.n_chars for r in docs)
    )
    emb = load_table(spark, SF_SMALL, "embeddings").collect()
    assert card[("embeddings", "n_rows")] == str(len(emb))
    assert card[("embeddings", "dim")] == str(max(len(r.embedding) for r in emb))


# --------------------------------------------------------------------------
# spearman_chars_tokens
# --------------------------------------------------------------------------


def test_spearman_matches_python_midrank_pearson(spark):
    """rho from the histogram-midrank device must equal a from-scratch
    Python Spearman (tie-aware midranks, Pearson over ranks)."""
    docs = load_table(spark, SF_SMALL, "documents").collect()
    xs = [r.n_chars for r in docs]
    ys = [len([t for t in r.text.split(" ") if t != ""]) for r in docs]

    def midranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        ranks = [0.0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while j + 1 < len(order) and vals[order[j + 1]] == vals[order[i]]:
                j += 1
            mr = (i + j) / 2 + 1
            for t in range(i, j + 1):
                ranks[order[t]] = mr
            i = j + 1
        return ranks

    rx, ry = midranks(xs), midranks(ys)
    n = len(rx)
    sx, sy = sum(rx), sum(ry)
    sxx = sum(v * v for v in rx)
    syy = sum(v * v for v in ry)
    sxy = sum(a * b for a, b in zip(rx, ry))
    want = (n * sxy - sx * sy) / math.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    row = QUERIES["spearman_chars_tokens"](spark, SF_SMALL).collect()[0]
    assert row.n_docs == n
    assert abs(row.spearman_rho - want) < 1e-6
    assert -1.0 <= row.spearman_rho <= 1.0
    assert row.spearman_rho > 0.5  # chars and tokens are strongly monotone


# --------------------------------------------------------------------------
# kendall_tau_rankers
# --------------------------------------------------------------------------


def test_kendall_tau_matches_python_pair_count(spark):
    """tau-b from the engine must equal a brute-force Python Kendall over
    the union of the two top-k lists with the k+1 fill."""
    from py_datalake_move_files_spark.operators.retrieval import (
        bm25_topk,
        ql_dirichlet_topk,
    )
    from py_datalake_move_files_spark.queries_audit import _KT_K, _KT_TERMS

    docs = load_table(spark, SF_SMALL, "documents")
    ra = {r.doc_id: r.rnk for r in bm25_topk(docs, _KT_TERMS, k=_KT_K).collect()}
    rb = {
        r.doc_id: r.rnk
        for r in ql_dirichlet_topk(docs, _KT_TERMS, k=_KT_K).collect()
    }
    ids = sorted(set(ra) | set(rb))
    fill = _KT_K + 1
    pts = [(ra.get(i, fill), rb.get(i, fill)) for i in ids]
    conc = disc = ta = tb = n0 = 0
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            n0 += 1
            d = (pts[i][0] - pts[j][0]) * (pts[i][1] - pts[j][1])
            conc += d > 0
            disc += d < 0
            ta += pts[i][0] == pts[j][0]
            tb += pts[i][1] == pts[j][1]
    row = QUERIES["kendall_tau_rankers"](spark, SF_SMALL).collect()[0]
    assert row.n_items == len(ids)
    assert (row.n_concordant, row.n_discordant) == (conc, disc)
    want = (conc - disc) / (math.sqrt(n0 - ta) * math.sqrt(n0 - tb))
    assert abs(row.tau_b - round(want, 6)) < 1e-9
    assert -1.0 <= row.tau_b <= 1.0


# --------------------------------------------------------------------------
# mixture_temperature_sweep
# --------------------------------------------------------------------------


def test_temperature_sweep_matches_python_and_is_monotone(spark):
    """Entropy/shares must match a from-scratch Python sweep, entropy must
    DECREASE as alpha rises (flatter -> truer to raw counts), and alpha=1
    must reproduce the raw language distribution exactly."""
    from py_datalake_move_files_spark.queries_audit import _TSWEEP_ALPHAS

    docs = load_table(spark, SF_SMALL, "documents").collect()
    cnt = Counter(r.lang for r in docs)
    got = {
        round(r.alpha, 2): r
        for r in QUERIES["mixture_temperature_sweep"](
            spark, SF_SMALL
        ).collect()
    }
    assert set(got) == {round(a, 2) for a in _TSWEEP_ALPHAS}
    prev_h = None
    for alpha in sorted(_TSWEEP_ALPHAS):
        ws = {l: math.exp(alpha * math.log(n)) for l, n in cnt.items()}
        # fold in lang order like both engines
        ordered = [ws[l] for l in sorted(ws)]
        tot = 0.0
        for w in ordered:
            tot += w
        h = 0.0
        for w in ordered:
            h += -(w / tot) * math.log(w / tot)
        r = got[round(alpha, 2)]
        assert r.n_langs == len(cnt)
        assert abs(r.entropy_nats - round(h, 6)) < 1e-9
        assert abs(r.effective_langs - round(math.exp(h), 4)) < 1e-9
        assert r.max_share_ppm == math.floor(max(ordered) * 1e6 / tot)
        if prev_h is not None:
            assert r.entropy_nats <= prev_h + 1e-9  # flatter at lower alpha
        prev_h = r.entropy_nats
    # alpha = 1 reproduces the raw mixture
    n_total = sum(cnt.values())
    assert got[1.0].max_share_ppm == math.floor(
        max(cnt.values()) * 1e6 / n_total
    )


# --------------------------------------------------------------------------
# ab_power_sample_size
# --------------------------------------------------------------------------


def test_ab_power_matches_python_formula_and_is_monotone(spark):
    """Per-arm sizes must equal the two-proportion formula on the measured
    baseline, and SHRINK as the detectable effect grows."""
    from py_datalake_move_files_spark.queries_audit import (
        _PWR_MDES,
        _PWR_Z_ALPHA,
        _PWR_Z_BETA,
    )

    ev = load_table(spark, SF_SMALL, "events").collect()
    n = len(ev)
    c = sum(1 for r in ev if r.event_type == "purchase")
    p1 = c / n
    got = {
        r.mde_pct: r
        for r in QUERIES["ab_power_sample_size"](spark, SF_SMALL).collect()
    }
    assert set(got) == {round(m * 100) for m in _PWR_MDES}
    prev = None
    for m in sorted(_PWR_MDES):
        p2 = p1 * (1.0 + m)
        z2 = (_PWR_Z_ALPHA + _PWR_Z_BETA) ** 2
        want = math.ceil(
            z2 * (p1 * (1 - p1) + p2 * (1 - p2)) / ((p2 - p1) * (p2 - p1))
        )
        r = got[round(m * 100)]
        assert (r.n_events, r.n_conv) == (n, c)
        assert r.n_per_arm == want
        assert r.n_total == 2 * want
        if prev is not None:
            assert r.n_per_arm < prev  # bigger effect -> smaller test
        prev = r.n_per_arm


# --------------------------------------------------------------------------
# doc_novelty_scores_sampled (r10 scale variant)
# --------------------------------------------------------------------------


def test_sampled_novelty_preserves_first_owner_on_sampled_shingles(spark):
    """Every (doc, sampled-shingle-count) must be consistent with the
    exact arm: sampled novelty uses the SAME first-owner relation, so a
    doc's n_first_sampled can never exceed the exact n_first... per
    sampled subset it must equal the exact first-owner count restricted
    to sampled digests — verified here by recomputing the digest filter
    in Python over the shingle stream."""
    from py_datalake_move_files_spark.operators import dedup as DD
    import hashlib

    docs = load_table(spark, SF_SMALL, "documents")
    s = (
        DD.with_shingles(docs.select("doc_id", "text"))
        .select("doc_id", "shingle_set")
        .collect()
    )
    K = 4
    per_doc = Counter()
    owner = {}
    for r in sorted(s, key=lambda r: r.doc_id):
        for sh in r.shingle_set:
            dg = hashlib.md5(sh.encode()).hexdigest()
            if int(dg[:12], 16) % K != 0:
                continue
            per_doc[r.doc_id] += 1
            if dg not in owner or r.doc_id < owner[dg]:
                owner[dg] = r.doc_id
    firsts = Counter(owner.values())
    got = {
        r.doc_id: r
        for r in QUERIES["doc_novelty_scores_sampled"](
            spark, SF_SMALL
        ).collect()
    }
    assert set(got) == set(per_doc)
    for d, ns in per_doc.items():
        assert got[d].n_shingles_sampled == ns
        assert got[d].n_first_sampled == firsts.get(d, 0)


# --------------------------------------------------------------------------
# degenerate-input guards (the profile_drift_report rule, applied r10)
# --------------------------------------------------------------------------


def _mini_lake(spark, tmp_path, **tables):
    """Write a minimal lake dir holding only the given tables."""
    for name, (schema, rows) in tables.items():
        spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
            str(tmp_path / f"{name}.parquet")
        )
    return str(tmp_path)


def test_mwu_one_group_absent_emits_null_not_abort(spark, tmp_path):
    """Events with only one of the two compared types: U is defined (all
    zero wins), effect size and z are NULL — the guard branch, which no
    harness fixture reaches."""
    import datetime as dt

    rows = [
        (i, dt.datetime(2024, 1, 1, 0, 0, i), i % 3, "purchase", 10.0 + i, "{}")
        for i in range(6)
    ]
    lake = _mini_lake(
        spark,
        tmp_path,
        events=(
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
            rows,
        ),
    )
    row = QUERIES["mann_whitney_u_events"](spark, lake).collect()[0]
    assert row.n_a == 6 and row.n_b == 0
    assert row.u2_a == 0
    assert row.rank_biserial_ppm is None
    assert row.z_stat is None


def test_ab_power_zero_conversions_emits_null_not_abort(spark, tmp_path):
    import datetime as dt

    rows = [
        (i, dt.datetime(2024, 1, 1, 0, 0, i), i % 3, "view", 1.0, "{}")
        for i in range(5)
    ]
    lake = _mini_lake(
        spark,
        tmp_path,
        events=(
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
            rows,
        ),
    )
    out = QUERIES["ab_power_sample_size"](spark, lake).collect()
    assert len(out) == 3
    for r in out:
        assert r.n_conv == 0
        assert r.n_per_arm is None and r.n_total is None


def test_spearman_constant_column_emits_null_not_nan(spark, tmp_path):
    rows = [(i, "one two three", "en", "s", 100) for i in range(4)]
    lake = _mini_lake(
        spark,
        tmp_path,
        documents=(
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
            rows,
        ),
    )
    row = QUERIES["spearman_chars_tokens"](spark, lake).collect()[0]
    assert row.n_docs == 4
    assert row.spearman_rho is None  # zero rank variance in BOTH columns


def test_t_closeness_single_bucket_is_zero(spark, tmp_path):
    """All balances in one kilo-bucket → B = 1 → every class's EMD is 0
    by the nb <= 1 guard (no 0/0)."""
    rows = [(i, f"c{i}", i % 3, 500.0, "BUILDING") for i in range(9)]
    lake = _mini_lake(
        spark,
        tmp_path,
        customer=(
            "c_custkey long, c_name string, c_nationkey int,"
            " c_acctbal double, c_mktsegment string",
            rows,
        ),
    )
    out = QUERIES["t_closeness_audit"](spark, lake).collect()
    assert out and all(r.t_ppm == 0 for r in out)


# --------------------------------------------------------------------------
# hapax_legomena_rate
# --------------------------------------------------------------------------


def test_hapax_rate_matches_python_count(spark):
    docs = load_table(spark, SF_SMALL, "documents").collect()
    per_src = defaultdict(Counter)
    for r in docs:
        for t in r.text.split(" "):
            if t != "":
                per_src[r.source][t] += 1
    got = {
        r.source: r
        for r in QUERIES["hapax_legomena_rate"](spark, SF_SMALL).collect()
    }
    assert set(got) == set(per_src)
    for src, cnt in per_src.items():
        r = got[src]
        hap = sum(1 for c in cnt.values() if c == 1)
        assert r.n_tokens == sum(cnt.values())
        assert r.vocab_size == len(cnt)
        assert r.n_hapax == hap
        assert r.hapax_share_ppm == hap * 1_000_000 // len(cnt)
        assert r.ttr_ppm == len(cnt) * 1_000_000 // sum(cnt.values())
        assert 0 <= r.hapax_share_ppm <= 1_000_000
