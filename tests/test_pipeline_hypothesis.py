"""Property-based tests for the round-8 pipeline devices: randomized
inputs checked against plain-Python recomputations. The contracts that
can silently break under refactoring are the water-filling closed form
(feasibility prefix, integer level), the winnowing window-coverage
guarantee on degenerate token streams, the Markov matrix square under
arbitrary event orders, and the quantile-normalization rank matching
under heavy ties."""

from __future__ import annotations

import tempfile
from collections import defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from py_datalake_move_files_spark.queries import QUERIES

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _write_docs(d, rows):
    """rows: (doc_id, text, lang, source) — n_chars derived."""
    spark_rows = [(i, t, lg, s, len(t)) for i, t, lg, s in rows]
    return spark_rows


@settings(**_SETTINGS)
@given(
    caps=st.lists(
        st.integers(min_value=1, max_value=40), min_size=1, max_size=6
    )
)
def test_waterfill_matches_python_on_random_pools(spark, caps):
    """Each pool is one doc of `cap` single-char tokens in its own
    (lang, source); the Spark allocation must equal the Python
    water-fill for any capacity mix (all-equal, one-giant, singleton)."""
    rows = [
        (i, " ".join(["w"] * cap), f"l{i}", f"s{i}")
        for i, cap in enumerate(caps)
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            _write_docs(d, rows),
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
        got = {
            (r["lang"], r["source"]): (r["cap_tokens"], r["alloc_tokens"])
            for r in QUERIES["token_budget_waterfill"](spark, d).collect()
        }
    budget = sum(caps) // 2
    order = sorted(enumerate(caps), key=lambda kv: (kv[1], f"l{kv[0]}", f"s{kv[0]}"))
    g = len(order)
    pk, kstar, pkstar = 0, 0, 0
    for k, (_, cap) in enumerate(order, start=1):
        pk += cap
        if pk + (g - k) * cap <= budget:
            kstar, pkstar = k, pk
    lvl = (budget - pkstar) // (g - kstar) if kstar < g else max(caps)
    for i, cap in enumerate(caps):
        assert got[(f"l{i}", f"s{i}")] == (cap, min(cap, lvl))


@settings(**_SETTINGS)
@given(
    toks=st.lists(
        st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=0, max_size=14
    )
)
def test_winnowing_guarantee_on_degenerate_streams(spark, toks):
    """For ANY token stream — empty, single-token, all-identical — every
    4-gram window of the hash sequence must contain a selected
    fingerprint, and the checksum must equal the Python winnow."""
    import hashlib

    text = " ".join(toks)
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(0, text, "en", "s", len(text))],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
        r = QUERIES["winnowing_fingerprints"](spark, d).collect()[0]
    ts = text.split(" ")
    grams = (
        [text]
        if len(ts) < 3
        else [" ".join(ts[i : i + 3]) for i in range(len(ts) - 2)]
    )
    gh = [int(hashlib.md5(g.encode()).hexdigest()[:12], 16) for g in grams]
    sel = (
        [min(gh)]
        if len(gh) <= 4
        else [min(gh[i : i + 4]) for i in range(len(gh) - 3)]
    )
    fps = set(sel)
    assert r["n_grams"] == len(gh)
    assert r["n_fps"] == len(fps)
    assert r["fp_checksum"] == sum(fps)
    for i in range(max(1, len(gh) - 3)):
        assert fps & set(gh[i : i + 4])


@settings(**_SETTINGS)
@given(
    seq=st.lists(
        st.sampled_from(["view", "click", "purchase"]),
        min_size=2,
        max_size=12,
    )
)
def test_markov_square_on_random_chains(spark, seq):
    """One user's arbitrary event chain: the engine's two-step matrix must
    equal the Python matrix square (including self-loops and absorbing
    states)."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, t0 + dt.timedelta(minutes=i), 7, ev, 0.0)
        for i, ev in enumerate(seq)
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long,"
            " event_type string, value double",
        ).write.mode("overwrite").parquet(f"{d}/events.parquet")
        got = {
            (r["src"], r["dst"]): (r["n_paths"], r["p2_micro"])
            for r in QUERIES["markov_two_step_reach"](spark, d).collect()
        }
    c = defaultdict(int)
    for a, b in zip(seq, seq[1:]):
        c[(a, b)] += 1
    ra = defaultdict(int)
    for (a, _), n in c.items():
        ra[a] += n
    want = defaultdict(lambda: [0, 0])
    for (a, b), cab in c.items():
        for (b2, e), cbe in c.items():
            if b2 == b:
                want[(a, e)][0] += cab * cbe
                want[(a, e)][1] += round(
                    1_000_000.0 * ((cab * cbe) / (ra[a] * ra[b]))
                )
    assert got == {k: tuple(v) for k, v in want.items()}


@settings(**_SETTINGS)
@given(
    lens=st.lists(
        st.tuples(
            st.sampled_from(["sA", "sB"]),
            st.integers(min_value=1, max_value=5),
        ),
        min_size=1,
        max_size=10,
    )
)
def test_quantile_normalization_rank_matching_under_ties(spark, lens):
    """Tiny length domain → heavy ties: each doc's normalized value must
    be the pooled sorted value at ceil(rn·N/ns) where rn breaks ties by
    doc_id — for any source mix, including single-source."""
    rows = [
        (i, "x" * n, "en", src) for i, (src, n) in enumerate(lens)
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            _write_docs(d, rows),
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
        got = {
            r["doc_id"]: r["norm_chars"]
            for r in QUERIES["quantile_normalize_lengths"](spark, d).collect()
        }
    pooled = sorted(n for _, n in lens)
    nn = len(pooled)
    per = defaultdict(list)
    for i, (src, n) in enumerate(lens):
        per[src].append((n, i))
    want = {}
    for src, docs in per.items():
        docs.sort()
        ns = len(docs)
        for rn, (_, did) in enumerate(docs, start=1):
            want[did] = pooled[(rn * nn + ns - 1) // ns - 1]
    assert got == want
