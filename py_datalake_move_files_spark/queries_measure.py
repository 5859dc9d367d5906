"""Round-11 tier: model-evaluation and corpus-measurement queries — the
second layer of the governance/measurement surface (round 10 added the
testing workhorses; this tier adds effect sizes, agreement, calibration,
sequential drift, and distribution-distance measures a training-data
pipeline runs before and after every curation change).

Determinism devices (module conventions, see ``queries.py`` module doc):

- integer-ppm renders via ``div`` / ``//`` over exact integer or
  DECIMAL(38,0) aggregates;
- the ONE order-sensitive float reduction in any query folds
  LEFT-TO-RIGHT over a key-sorted array (``F.aggregate`` ≡ DuckDB
  ``list_reduce``, the weekday-ANOVA device) or is micro-rounded per
  term BEFORE an order-free integer sum;
- degenerate inputs (empty groups, zero variance, zero cells) yield
  NULL, never NaN and never an ANSI abort (the profile_drift_report
  rule, enforced registry-wide by tools/degenerate_sweep.py).

Every query carries a full DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from py_datalake_move_files_spark.functions.scaling import ensure_parallelism
from py_datalake_move_files_spark.operators import text as TXT
from py_datalake_move_files_spark.queries import _t, register

# --------------------------------------------------------------------------
# tokenizer compression ratio by (lang, source)
# --------------------------------------------------------------------------

_COMP_ORACLE = f"""
SELECT lang, source,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(CAST(n_chars AS DECIMAL(38,0))) AS BIGINT) AS total_chars,
  CAST(sum(CAST(len(regexp_extract_all(text, '{TXT.BPE_ISH_PATTERN}'))
      AS DECIMAL(38,0))) AS BIGINT) AS total_tokens,
  -- HUGEINT floor division: DuckDB's // on DECIMAL operands ROUNDS to
  -- nearest (off-by-one vs Spark's truncating `div`); // on HUGEINT is
  -- a true floor
  CASE WHEN sum(CAST(len(regexp_extract_all(text, '{TXT.BPE_ISH_PATTERN}'))
      AS DECIMAL(38,0))) = 0 THEN NULL
    ELSE CAST(CAST(sum(CAST(n_chars AS DECIMAL(38,0))) AS HUGEINT) * 1000000
      // CAST(sum(CAST(len(regexp_extract_all(text, '{TXT.BPE_ISH_PATTERN}'))
           AS DECIMAL(38,0))) AS HUGEINT) AS BIGINT)
  END AS chars_per_token_ppm
FROM documents GROUP BY lang, source
"""


@register("compression_ratio_stats", _COMP_ORACLE)
def q_compression_ratio_stats(spark, sf_dir):
    """Tokenizer compression ratio (characters per BPE-ish token) per
    (lang, source) stratum — the first number a tokenizer-training run
    checks per corpus slice: a stratum whose ratio collapses is either
    non-linguistic (code, tables) or out-of-vocabulary for the merge
    rules, and its token BUDGET (not its byte budget) is what the
    mixture planner actually spends.

    Exactness: token counts are integers from the shared BPE-ish regex
    (``token_counts``' device); char/token sums go through DECIMAL(38,0)
    (corpus-sized sums of document-sized values — the r10 overflow
    rule) and the ratio is one integer-ppm floor division with a
    zero-token NULL guard.

    100 TB shape: one map-side-combined aggregate keyed by the tiny
    (lang, source) domain — one regex pass per document, one shuffle of
    |langs × sources| rows, no joins."""
    docs = ensure_parallelism(_t(spark, sf_dir, "documents"))
    toks = F.expr(
        f"CAST(size(regexp_extract_all(text, '{TXT.BPE_ISH_PATTERN}', 0))"
        " AS DECIMAL(38,0))"
    )
    return (
        docs.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.expr("CAST(n_chars AS DECIMAL(38,0))")).alias("__chars"),
            F.sum(toks).alias("__toks"),
        )
        .select(
            "lang",
            "source",
            "n_docs",
            F.col("__chars").cast("long").alias("total_chars"),
            F.col("__toks").cast("long").alias("total_tokens"),
            F.expr(
                "CASE WHEN __toks = 0 THEN NULL"
                " ELSE CAST(__chars * 1000000 div __toks AS BIGINT) END"
            ).alias("chars_per_token_ppm"),
        )
    )


# --------------------------------------------------------------------------
# vocabulary coverage curve (corpus mass covered by the top-k vocab)
# --------------------------------------------------------------------------

_COV_KS = (100, 1000, 10000)

_COV_ORACLE = f"""
WITH v AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS c FROM (
    SELECT unnest(string_split(text, ' ')) AS tok FROM documents
  ) WHERE tok <> '' GROUP BY tok
),
r AS (
  SELECT c, row_number() OVER (ORDER BY c DESC, tok ASC) AS rnk FROM v
),
tot AS (SELECT sum(CAST(c AS DECIMAL(38,0))) AS s,
               CAST(count(*) AS BIGINT) AS vocab FROM v)
SELECT k, vocab AS vocab_size,
  CAST(covered AS BIGINT) AS covered_tokens,
  -- HUGEINT floor division (DECIMAL // is float division in DuckDB)
  CASE WHEN s = 0 THEN NULL
       ELSE CAST(CAST(covered AS HUGEINT) * 1000000 // CAST(s AS HUGEINT)
            AS BIGINT) END AS coverage_ppm
FROM (
  SELECT k, coalesce(sum(CAST(c AS DECIMAL(38,0))), 0) AS covered
  FROM (SELECT unnest([{", ".join(str(k) for k in _COV_KS)}]) AS k)
  LEFT JOIN r ON r.rnk <= k
  GROUP BY k
) CROSS JOIN tot
ORDER BY k
"""


@register("vocab_coverage_curve", _COV_ORACLE)
def q_vocab_coverage_curve(spark, sf_dir):
    """Corpus-mass coverage of the top-k vocabulary for k in
    {_COV_KS} — the tokenizer-budget curve: what fraction of all token
    OCCURRENCES the k most frequent types absorb. Combined with
    ``vocab_oov_rate`` (fixed external vocab) and ``heaps_law_fit``
    (vocabulary growth), it answers "how big must the vocab be" before
    training a tokenizer at all.

    Ranking is deterministic (count DESC, token ASC). Exactness:
    occurrence sums in DECIMAL(38,0) (corpus-sized), coverage as
    integer-ppm floor division, NULL on an empty corpus.

    100 TB shape: the only corpus-sized stage is the map-side-combined
    vocabulary count; the rank window runs over the VOCAB domain
    (|types|, Heaps-sublinear in corpus size), single-partition by
    design like every vocab-rank device in the registry (zipf_slope) —
    at a 10⁷-type vocabulary that is one executor's work, not a
    bottleneck; the k-probe join is a 3-row broadcast."""
    docs = ensure_parallelism(_t(spark, sf_dir, "documents"))
    v = (
        docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    r = v.select(
        "c",
        F.row_number()
        .over(Window.orderBy(F.col("c").desc(), F.col("tok").asc()))
        .alias("rnk"),
    )
    r = r.localCheckpoint(eager=True)
    tot = r.agg(
        F.sum(F.expr("CAST(c AS DECIMAL(38,0))")).alias("s"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
    )
    ks = spark.range(1).selectExpr(
        f"explode(array({', '.join(str(k) for k in _COV_KS)})) AS k"
    )
    covered = (
        ks.join(r, r["rnk"] <= ks["k"], "left")
        .groupBy("k")
        .agg(
            F.coalesce(
                F.sum(F.expr("CAST(c AS DECIMAL(38,0))")), F.lit(0)
            ).alias("covered")
        )
    )
    return (
        covered.crossJoin(F.broadcast(tot))
        .select(
            "k",
            F.col("vocab").alias("vocab_size"),
            F.col("covered").cast("long").alias("covered_tokens"),
            F.expr(
                "CASE WHEN s = 0 THEN NULL"
                " ELSE CAST(covered * 1000000 div s AS BIGINT) END"
            ).alias("coverage_ppm"),
        )
        .orderBy("k")
    )


# --------------------------------------------------------------------------
# odds ratio with Wald CI (urgent priority -> fulfilled status)
# --------------------------------------------------------------------------

_OR_ORACLE = """
WITH c AS (
  SELECT
    CAST(count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        AND o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS a,
    CAST(count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        AND o_orderstatus <> 'F' THEN 1 END) AS BIGINT) AS b,
    CAST(count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        AND o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS c_,
    CAST(count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        AND o_orderstatus <> 'F' THEN 1 END) AS BIGINT) AS d
  FROM orders
)
SELECT a, b, c_ AS c, d,
  CASE WHEN a = 0 OR b = 0 OR c_ = 0 OR d = 0 THEN NULL
    ELSE round((CAST(a AS DOUBLE) * d) / (CAST(b AS DOUBLE) * c_), 6)
  END AS odds_ratio,
  CASE WHEN a = 0 OR b = 0 OR c_ = 0 OR d = 0 THEN NULL
    ELSE round(exp(ln((CAST(a AS DOUBLE) * d) / (CAST(b AS DOUBLE) * c_))
      - 1.959964 * sqrt(1.0/a + 1.0/b + 1.0/c_ + 1.0/d)), 6)
  END AS ci_lo,
  CASE WHEN a = 0 OR b = 0 OR c_ = 0 OR d = 0 THEN NULL
    ELSE round(exp(ln((CAST(a AS DOUBLE) * d) / (CAST(b AS DOUBLE) * c_))
      + 1.959964 * sqrt(1.0/a + 1.0/b + 1.0/c_ + 1.0/d)), 6)
  END AS ci_hi
FROM c
"""


@register("odds_ratio_priority_ci", _OR_ORACLE)
def q_odds_ratio_priority_ci(spark, sf_dir):
    """Odds ratio of order fulfilment for high-priority vs other orders,
    with the 95% Wald log-odds confidence interval — the 2×2 effect-size
    companion to ``ab_conversion_ztest`` (which tests, but does not size,
    a difference) and the building block of every per-slice bias audit
    (swap in any exposure/outcome pair of predicates).

    Exactness: the 2×2 cells are one conditional-count aggregate (exact
    integers); OR and the CI are a one-row double chain with IDENTICAL
    text in both engines (z = 1.959964 injected as a literal — no engine
    quantile function). Any zero cell → NULL everything (the degenerate
    rule; the Wald interval is undefined, and a Haldane correction would
    silently change the estimand).

    100 TB shape: single map-side-combined aggregate, one 1-row result —
    no shuffle beyond the 4-counter combine."""
    orders = _t(spark, sf_dir, "orders")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    ff = F.col("o_orderstatus") == "F"
    cells = orders.agg(
        F.count(F.when(hi & ff, 1)).cast("long").alias("a"),
        F.count(F.when(hi & ~ff, 1)).cast("long").alias("b"),
        F.count(F.when(~hi & ff, 1)).cast("long").alias("c_"),
        F.count(F.when(~hi & ~ff, 1)).cast("long").alias("d"),
    )
    guard = "a = 0 OR b = 0 OR c_ = 0 OR d = 0"
    lor = "ln((CAST(a AS DOUBLE) * d) / (CAST(b AS DOUBLE) * c_))"
    se = "sqrt(1.0/a + 1.0/b + 1.0/c_ + 1.0/d)"
    return cells.select(
        "a",
        "b",
        F.col("c_").alias("c"),
        "d",
        F.expr(
            f"CASE WHEN {guard} THEN NULL"
            " ELSE round((CAST(a AS DOUBLE) * d)"
            " / (CAST(b AS DOUBLE) * c_), 6) END"
        ).alias("odds_ratio"),
        F.expr(
            f"CASE WHEN {guard} THEN NULL"
            f" ELSE round(exp({lor} - 1.959964 * {se}), 6) END"
        ).alias("ci_lo"),
        F.expr(
            f"CASE WHEN {guard} THEN NULL"
            f" ELSE round(exp({lor} + 1.959964 * {se}), 6) END"
        ).alias("ci_hi"),
    )


# --------------------------------------------------------------------------
# Cramér's V association matrix over pinned categorical pairs
# --------------------------------------------------------------------------

def _cramers_pair_dd(pair: str, table: str, x: str, y: str) -> str:
    return f"""
  SELECT '{pair}' AS pair, chi2_micro, r_levels, c_levels, n_rows FROM (
    WITH o AS (
      SELECT {x} AS x, {y} AS y, CAST(count(*) AS BIGINT) AS o
      FROM {table} GROUP BY 1, 2
    ),
    rt AS (SELECT x, CAST(sum(o) AS BIGINT) AS rt FROM o GROUP BY x),
    ct AS (SELECT y, CAST(sum(o) AS BIGINT) AS ct FROM o GROUP BY y),
    n AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM o)
    SELECT
      CAST(sum(CAST(round(
        (CAST(o.o AS DOUBLE) * n.n - CAST(rt.rt AS DOUBLE) * ct.ct)
        * (CAST(o.o AS DOUBLE) * n.n - CAST(rt.rt AS DOUBLE) * ct.ct)
        / (CAST(n.n AS DOUBLE) * rt.rt * ct.ct) * 1000000
      ) AS BIGINT)) AS BIGINT) AS chi2_micro,
      CAST((SELECT count(*) FROM rt) AS BIGINT) AS r_levels,
      CAST((SELECT count(*) FROM ct) AS BIGINT) AS c_levels,
      CAST(max(n.n) AS BIGINT) AS n_rows
    FROM o JOIN rt USING (x) JOIN ct USING (y) CROSS JOIN n
  )
"""


_CRAMER_PAIRS = (
    ("orders:status_x_priority", "orders", "o_orderstatus", "o_orderpriority"),
    ("documents:lang_x_source", "documents", "lang", "source"),
)

_CRAMER_ORACLE = (
    "SELECT pair, n_rows, r_levels, c_levels, chi2_micro,"
    " CASE WHEN n_rows = 0 OR least(r_levels, c_levels) <= 1 THEN NULL"
    " ELSE round(sqrt(CAST(chi2_micro AS DOUBLE) / 1000000.0"
    " / (CAST(n_rows AS DOUBLE) * (least(r_levels, c_levels) - 1))), 6)"
    " END AS cramers_v FROM ("
    + " UNION ALL ".join(_cramers_pair_dd(*p) for p in _CRAMER_PAIRS)
    + ") ORDER BY pair"
)


@register("cramers_v_categorical", _CRAMER_ORACLE)
def q_cramers_v_categorical(spark, sf_dir):
    """Cramér's V — the normalized effect size of categorical×categorical
    association — for pinned column pairs (order status × priority,
    document lang × source). The chi² tests already in the registry
    (``source_lang_chi2``, ``event_hour_mix_chi2``) grow with N and
    always "fire" at 100 TB; V is the N-free number a curation gate can
    threshold ("drop the feature if V > 0.3 with the label").

    Exactness: observed/marginal counts are exact integers; each cell's
    chi² term is an IDENTICAL-text double chain ((O·N − rt·ct)²/(N·rt·ct)
    — per-cell deterministic, no fold), micro-rounded per cell and then
    integer-summed (order-free). V renders once per pair from the exact
    chi²_micro. Degenerate contingency (one level either side, empty
    table) → NULL V.

    100 TB shape, per pair: one contingency aggregate (cells = the tiny
    level-domain product), two marginal re-aggregates of the CELLS (not
    the data), broadcast back onto the cells — the corpus is scanned
    once per pair and everything after is domain-sized."""
    outs = []
    for pair, table, x, y in _CRAMER_PAIRS:
        t = _t(spark, sf_dir, table)
        o = t.groupBy(
            F.col(x).alias("x"), F.col(y).alias("y")
        ).agg(F.count(F.lit(1)).cast("long").alias("o"))
        o = o.localCheckpoint(eager=True)
        rt = o.groupBy("x").agg(F.sum("o").cast("long").alias("rt"))
        ct = o.groupBy("y").agg(F.sum("o").cast("long").alias("ct"))
        n = o.agg(F.sum("o").cast("long").alias("n"))
        cells = (
            o.join(F.broadcast(rt), "x")
            .join(F.broadcast(ct), "y")
            .crossJoin(F.broadcast(n))
        )
        term = (
            "CAST(round((CAST(o AS DOUBLE) * n - CAST(rt AS DOUBLE) * ct)"
            " * (CAST(o AS DOUBLE) * n - CAST(rt AS DOUBLE) * ct)"
            " / (CAST(n AS DOUBLE) * rt * ct) * 1000000) AS BIGINT)"
        )
        agg = cells.agg(
            F.sum(F.expr(term)).cast("long").alias("chi2_micro"),
            F.countDistinct("x").cast("long").alias("r_levels"),
            F.countDistinct("y").cast("long").alias("c_levels"),
            F.max("n").cast("long").alias("n_rows"),
        )
        outs.append(agg.select(F.lit(pair).alias("pair"), "*"))
    u = outs[0]
    for x in outs[1:]:
        u = u.unionByName(x)
    return u.select(
        "pair",
        F.coalesce("n_rows", F.lit(0)).alias("n_rows"),
        F.coalesce("r_levels", F.lit(0)).alias("r_levels"),
        F.coalesce("c_levels", F.lit(0)).alias("c_levels"),
        F.coalesce("chi2_micro", F.lit(0)).alias("chi2_micro"),
        F.expr(
            "CASE WHEN coalesce(n_rows, 0) = 0"
            " OR least(r_levels, c_levels) <= 1 THEN NULL"
            " ELSE round(sqrt(CAST(chi2_micro AS DOUBLE) / 1000000.0"
            " / (CAST(n_rows AS DOUBLE) * (least(r_levels, c_levels) - 1)))"
            ", 6) END"
        ).alias("cramers_v"),
    ).orderBy("pair")


# --------------------------------------------------------------------------
# McNemar's test between two binary quality rules
# --------------------------------------------------------------------------

_STOP_IN = ", ".join(f"'{w}'" for w in TXT.STOPWORDS)

#: the two binary labelers: ALL-INTEGER predicates (no float thresholds),
#: shared between McNemar and Fleiss below
_DD_RULE_LEN = "len(string_split(text, ' ')) >= 40"
_DD_RULE_STOP = (
    f"len(list_filter(string_split(text, ' '), t -> t IN ({_STOP_IN}))) * 5"
    " >= len(string_split(text, ' '))"
)
_DD_RULE_PUNCT = (
    "len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) * 10 <= length(text)"
)

_SP_RULE_LEN = "size(split(text, ' ')) >= 40"
_SP_RULE_STOP = (
    f"size(filter(split(text, ' '), t -> t IN ({_STOP_IN}))) * 5"
    " >= size(split(text, ' '))"
)
_SP_RULE_PUNCT = (
    "size(regexp_extract_all(text, '[^a-zA-Z0-9 ]', 0)) * 10 <= length(text)"
)

_MCNEMAR_ORACLE = f"""
WITH r AS (
  SELECT CASE WHEN {_DD_RULE_LEN} THEN 1 ELSE 0 END AS r1,
         CASE WHEN {_DD_RULE_STOP} THEN 1 ELSE 0 END AS r2
  FROM documents
),
c AS (
  SELECT
    CAST(count(CASE WHEN r1 = 1 AND r2 = 1 THEN 1 END) AS BIGINT) AS both_pass,
    CAST(count(CASE WHEN r1 = 1 AND r2 = 0 THEN 1 END) AS BIGINT) AS only_len,
    CAST(count(CASE WHEN r1 = 0 AND r2 = 1 THEN 1 END) AS BIGINT) AS only_stop,
    CAST(count(CASE WHEN r1 = 0 AND r2 = 0 THEN 1 END) AS BIGINT) AS both_fail
  FROM r
)
SELECT both_pass, only_len, only_stop, both_fail,
  CASE WHEN only_len + only_stop = 0 THEN NULL
    ELSE round((CAST(only_len AS DOUBLE) - only_stop)
      * (CAST(only_len AS DOUBLE) - only_stop)
      / (CAST(only_len AS DOUBLE) + only_stop), 6)
  END AS mcnemar_chi2
FROM c
"""


@register("mcnemar_quality_rules", _MCNEMAR_ORACLE)
def q_mcnemar_quality_rules(spark, sf_dir):
    """McNemar's paired test between two binary quality labelers (the
    length rule vs the stopword-ratio rule) on the SAME documents — the
    right test when comparing two filters on one corpus: only the
    DISCORDANT documents carry information, and the chi² is
    (b−c)²/(b+c) over those two cells. ``lang_kappa_score`` measures
    agreement; this tests whether the two rules' pass RATES differ.

    Both rules are all-integer predicates (count·k ≥ count — no float
    thresholds), so the 2×2 is exact and reproducible bit-for-bit. The
    statistic is a one-row double chain; b + c = 0 (no discordant
    documents) → NULL per the degenerate rule.

    100 TB shape: one conditional-count aggregate over one scan — the
    rules evaluate inline, no joins, 4-counter combine."""
    docs = _t(spark, sf_dir, "documents")
    r1 = F.expr(_SP_RULE_LEN)
    r2 = F.expr(_SP_RULE_STOP)
    c = docs.agg(
        F.count(F.when(r1 & r2, 1)).cast("long").alias("both_pass"),
        F.count(F.when(r1 & ~r2, 1)).cast("long").alias("only_len"),
        F.count(F.when(~r1 & r2, 1)).cast("long").alias("only_stop"),
        F.count(F.when(~r1 & ~r2, 1)).cast("long").alias("both_fail"),
    )
    return c.select(
        "both_pass",
        "only_len",
        "only_stop",
        "both_fail",
        F.expr(
            "CASE WHEN only_len + only_stop = 0 THEN NULL"
            " ELSE round((CAST(only_len AS DOUBLE) - only_stop)"
            " * (CAST(only_len AS DOUBLE) - only_stop)"
            " / (CAST(only_len AS DOUBLE) + only_stop), 6) END"
        ).alias("mcnemar_chi2"),
    )
