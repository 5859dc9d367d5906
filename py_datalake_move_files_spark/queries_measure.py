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
  -- Integer division semantics (ADVICE r11): DuckDB's // on DECIMAL
  -- operands is PLAIN division (7//2 = 3.5 — no integer result at all),
  -- so the operands must be cast to HUGEINT first; // on HUGEINT/BIGINT
  -- truncates toward zero exactly like Spark's `div`
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
      -- NULL categories are unattributed rows, not a level: excluded in
      -- both arms (Spark's countDistinct ignores NULL where the level
      -- subqueries here would count the NULL cell row)
      SELECT {x} AS x, {y} AS y, CAST(count(*) AS BIGINT) AS o
      FROM {table} WHERE {x} IS NOT NULL AND {y} IS NOT NULL GROUP BY 1, 2
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
    # coalesce mirrors the Spark arm: max/sum over an EMPTY contingency
    # aggregate are NULL in DuckDB where the engine reports 0
    "SELECT pair, coalesce(n_rows, 0) AS n_rows, r_levels, c_levels,"
    " coalesce(chi2_micro, 0) AS chi2_micro,"
    " CASE WHEN coalesce(n_rows, 0) = 0"
    " OR least(r_levels, c_levels) <= 1 THEN NULL"
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
        # NULL categories excluded in both arms (see oracle comment)
        o = (
            t.where(F.col(x).isNotNull() & F.col(y).isNotNull())
            .groupBy(F.col(x).alias("x"), F.col(y).alias("y"))
            .agg(F.count(F.lit(1)).cast("long").alias("o"))
        )
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
  -- NULL texts are unratable: excluded in both arms (a NULL rule
  -- condition falls to the 0 branch in SQL CASE but to no branch in
  -- Spark's conditional counts)
  SELECT CASE WHEN {_DD_RULE_LEN} THEN 1 ELSE 0 END AS r1,
         CASE WHEN {_DD_RULE_STOP} THEN 1 ELSE 0 END AS r2
  FROM documents WHERE text IS NOT NULL
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
    # NULL texts excluded in both arms (see oracle comment)
    docs = _t(spark, sf_dir, "documents").where(F.col("text").isNotNull())
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


# --------------------------------------------------------------------------
# Fleiss' kappa across the three binary quality raters
# --------------------------------------------------------------------------

_FLEISS_ORACLE = f"""
WITH v AS (
  -- NULL texts are unratable (the McNemar rule)
  SELECT (CASE WHEN {_DD_RULE_LEN} THEN 1 ELSE 0 END)
       + (CASE WHEN {_DD_RULE_STOP} THEN 1 ELSE 0 END)
       + (CASE WHEN {_DD_RULE_PUNCT} THEN 1 ELSE 0 END) AS c
  FROM documents WHERE text IS NOT NULL
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    CAST(sum(c) AS BIGINT) AS s1,
    CAST(sum(c * c + (3 - c) * (3 - c)) AS BIGINT) AS s2
  FROM v
)
SELECT n AS n_docs, s1 AS votes_pos,
  CASE WHEN n = 0 THEN NULL
    ELSE round((CAST(s2 AS DOUBLE) - 3.0 * n) / (6.0 * n), 6) END AS p_bar,
  CASE WHEN n = 0 THEN NULL
    ELSE round((CAST(s1 AS DOUBLE) * s1
        + (3.0 * n - s1) * (3.0 * n - s1)) / (9.0 * n * n), 6) END AS p_e,
  CASE WHEN n = 0 OR (CAST(s1 AS DOUBLE) * s1
        + (3.0 * n - s1) * (3.0 * n - s1)) / (9.0 * n * n) >= 1.0 THEN NULL
    ELSE round(((CAST(s2 AS DOUBLE) - 3.0 * n) / (6.0 * n)
        - (CAST(s1 AS DOUBLE) * s1
           + (3.0 * n - s1) * (3.0 * n - s1)) / (9.0 * n * n))
      / (1.0 - (CAST(s1 AS DOUBLE) * s1
           + (3.0 * n - s1) * (3.0 * n - s1)) / (9.0 * n * n)), 6)
  END AS fleiss_kappa
FROM s
"""


@register("fleiss_kappa_raters", _FLEISS_ORACLE)
def q_fleiss_kappa_raters(spark, sf_dir):
    """Fleiss' kappa — chance-corrected agreement among THREE binary
    quality raters (the length, stopword-ratio, and punctuation rules)
    on every document. ``lang_kappa_score`` is Cohen's kappa for two
    raters; Fleiss generalizes to a rater panel, the standard number a
    labeling pipeline reports before trusting majority-vote labels.

    For binary categories with r=3 raters, per-item agreement P_i =
    (c² + (3−c)² − 3)/6 where c is the positive-vote count, so the whole
    statistic reduces to THREE exact integers (n, Σc, Σ[c²+(3−c)²]) and
    one one-row double chain with identical text in both engines. The
    raters are all-integer predicates (shared with
    ``mcnemar_quality_rules``). Degenerate panels (empty corpus, or
    P_e = 1 — every vote unanimous in one category) → NULL.

    100 TB shape: one conditional-sum aggregate over one scan; the vote
    count c evaluates inline — no joins, 3-counter combine."""
    # NULL texts excluded in both arms (the McNemar rule)
    docs = _t(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    c = (
        F.expr(f"CASE WHEN {_SP_RULE_LEN} THEN 1 ELSE 0 END")
        + F.expr(f"CASE WHEN {_SP_RULE_STOP} THEN 1 ELSE 0 END")
        + F.expr(f"CASE WHEN {_SP_RULE_PUNCT} THEN 1 ELSE 0 END")
    )
    v = docs.select(c.alias("c"))
    s = v.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("long").alias("s1"),
        F.sum(F.expr("c * c + (3 - c) * (3 - c)")).cast("long").alias("s2"),
    )
    pe = (
        "(CAST(s1 AS DOUBLE) * s1"
        " + (3.0 * n - s1) * (3.0 * n - s1)) / (9.0 * n * n)"
    )
    pbar = "(CAST(s2 AS DOUBLE) - 3.0 * n) / (6.0 * n)"
    return s.select(
        F.col("n").alias("n_docs"),
        F.col("s1").alias("votes_pos"),
        F.expr(
            f"CASE WHEN n = 0 THEN NULL ELSE round({pbar}, 6) END"
        ).alias("p_bar"),
        F.expr(
            f"CASE WHEN n = 0 THEN NULL ELSE round({pe}, 6) END"
        ).alias("p_e"),
        F.expr(
            f"CASE WHEN n = 0 OR {pe} >= 1.0 THEN NULL"
            f" ELSE round(({pbar} - {pe}) / (1.0 - {pe}), 6) END"
        ).alias("fleiss_kappa"),
    )


# --------------------------------------------------------------------------
# Grubbs' max-deviation outlier statistic on order prices
# --------------------------------------------------------------------------

_GRUBBS_ORACLE = """
WITH p AS (
  SELECT o_orderkey, o_totalprice,
    CAST(round(o_totalprice * 100) AS BIGINT) AS pc
  FROM orders
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CAST(pc AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sp,
    sum(CAST(pc AS DECIMAL(19,0)) * pc) AS spp
  FROM p
),
dev AS (
  SELECT p.o_orderkey, p.o_totalprice,
    abs(CAST(p.pc AS DECIMAL(38,0)) * s.n - s.sp) AS d, s.n, s.sp, s.spp
  FROM p CROSS JOIN s
  ORDER BY d DESC, p.o_orderkey ASC LIMIT 1
)
SELECT n AS n_orders, o_orderkey AS outlier_orderkey,
  o_totalprice AS outlier_price,
  CASE WHEN n < 2 THEN NULL
    ELSE round(CAST(sp AS DOUBLE) / n / 100.0, 6) END AS mean_price,
  CASE WHEN n < 2
      OR CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE) / n
         <= 0.0 THEN NULL
    ELSE round((CAST(d AS DOUBLE) / n)
      / sqrt((CAST(spp AS DOUBLE)
              - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE) / n)
             / (CAST(n AS DOUBLE) - 1.0)), 6)
  END AS g_stat
FROM dev
"""


@register("grubbs_outlier_prices", _GRUBBS_ORACLE)
def q_grubbs_outlier_prices(spark, sf_dir):
    """Grubbs' statistic G = max|x − x̄| / s over order prices, with the
    arg-max row identified — the single-most-extreme-value screen that
    complements the rate-based outlier monitors (``mad_outlier_events``
    counts outliers; Grubbs asks "is the worst point explainable").

    Determinism: prices micro-round to exact integer CENTS; Σp and Σp²
    are DECIMAL sums (p·n products are data-sized × data-sized — the r10
    overflow rule); the arg-max deviation is the EXACT integer
    |p·n − Σp| (no division before the comparison), tie-broken by
    orderkey, so the selected row is bit-deterministic; G renders once
    from the exact aggregates. Zero variance or n<2 → NULL.

    100 TB shape: one moment aggregate, broadcast back onto the scan,
    then a top-1 TakeOrdered (no global sort materializes)."""
    orders = _t(spark, sf_dir, "orders")
    p = orders.select(
        "o_orderkey",
        "o_totalprice",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("pc"),
    )
    s = p.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr("CAST(sum(CAST(pc AS DECIMAL(38,0))) AS DECIMAL(38,0))").alias(
            "sp"
        ),
        F.expr("sum(CAST(pc AS DECIMAL(19,0)) * pc)").alias("spp"),
    )
    dev = (
        p.crossJoin(F.broadcast(s))
        .select(
            "o_orderkey",
            "o_totalprice",
            F.expr("abs(CAST(pc AS DECIMAL(38,0)) * n - sp)").alias("d"),
            "n",
            "sp",
            "spp",
        )
        .orderBy(F.col("d").desc(), F.col("o_orderkey").asc())
        .limit(1)
    )
    var = (
        "CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE) / n"
    )
    return dev.select(
        F.col("n").alias("n_orders"),
        F.col("o_orderkey").alias("outlier_orderkey"),
        F.col("o_totalprice").alias("outlier_price"),
        F.expr(
            "CASE WHEN n < 2 THEN NULL"
            " ELSE round(CAST(sp AS DOUBLE) / n / 100.0, 6) END"
        ).alias("mean_price"),
        F.expr(
            f"CASE WHEN n < 2 OR {var} <= 0.0 THEN NULL"
            " ELSE round((CAST(d AS DOUBLE) / n)"
            f" / sqrt(({var}) / (CAST(n AS DOUBLE) - 1.0)), 6) END"
        ).alias("g_stat"),
    )


# --------------------------------------------------------------------------
# Wald–Wolfowitz runs test on daily event-value movements
# --------------------------------------------------------------------------

_RUNS_ORACLE = """
WITH d AS (
  SELECT date_trunc('day', ts) AS d,
    CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS x
  FROM events GROUP BY 1
),
m AS (
  SELECT d, x - lag(x) OVER (ORDER BY d) AS dx FROM d
),
sgn AS (
  SELECT d, CASE WHEN dx > 0 THEN 1 ELSE -1 END AS s
  FROM m WHERE dx IS NOT NULL AND dx <> 0
),
rr AS (
  SELECT s, CASE WHEN s <> lag(s) OVER (ORDER BY d) THEN 1 ELSE 0 END AS brk
  FROM sgn
),
c AS (
  SELECT
    CAST(count(CASE WHEN s = 1 THEN 1 END) AS BIGINT) AS n_up,
    CAST(count(CASE WHEN s = -1 THEN 1 END) AS BIGINT) AS n_dn,
    CAST(count(*) AS BIGINT) AS n,
    CAST(CASE WHEN count(*) = 0 THEN 0
         ELSE 1 + sum(brk) END AS BIGINT) AS runs
  FROM rr
)
SELECT n_up, n_dn, runs,
  CASE WHEN n_up = 0 OR n_dn = 0 OR n < 2
      OR (2.0 * n_up * n_dn) * (2.0 * n_up * n_dn - n)
         / (CAST(n AS DOUBLE) * n * (n - 1.0)) <= 0.0 THEN NULL
    ELSE round((CAST(runs AS DOUBLE)
        - (1.0 + 2.0 * n_up * n_dn / CAST(n AS DOUBLE)))
      / sqrt((2.0 * n_up * n_dn) * (2.0 * n_up * n_dn - n)
             / (CAST(n AS DOUBLE) * n * (n - 1.0))), 6)
  END AS z_stat
FROM c
"""


@register("runs_test_daily_events", _RUNS_ORACLE)
def q_runs_test_daily_events(spark, sf_dir):
    """Wald–Wolfowitz runs test for randomness of the daily event-value
    series: are up/down day-over-day movements exchangeable, or is there
    momentum/mean-reversion the trend monitors (``mann_kendall_trend``)
    would conflate with drift? Counts runs of consecutive same-sign
    moves and compares against the exchangeability null.

    Determinism: daily values micro-round BEFORE the integer day sums;
    signs are exact integer comparisons; zero moves drop (the pinned
    convention) BEFORE adjacency, so the run count is an exact integer
    window fold; z renders once from (n_up, n_dn, runs) with zero-group
    and zero-variance NULL guards.

    100 TB shape: one map-side-combined daily aggregate (calendar-
    bounded rows), then two lag windows over the |days| domain — the
    documented single-partition calendar-series device (every daily
    query in the registry shares it)."""
    ev = _t(spark, sf_dir, "events")
    d = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.sum(F.expr("CAST(round(value * 1000000) AS BIGINT)"))
        .cast("long")
        .alias("x")
    )
    w = Window.orderBy("d")
    m = d.select("d", (F.col("x") - F.lag("x").over(w)).alias("dx"))
    sgn = m.where(F.col("dx").isNotNull() & (F.col("dx") != 0)).select(
        "d", F.expr("CASE WHEN dx > 0 THEN 1 ELSE -1 END").alias("s")
    )
    rr = sgn.select(
        "s",
        F.expr(
            "CASE WHEN s <> lag(s) OVER (ORDER BY d) THEN 1 ELSE 0 END"
        ).alias("brk"),
    )
    c = rr.agg(
        F.count(F.when(F.col("s") == 1, 1)).cast("long").alias("n_up"),
        F.count(F.when(F.col("s") == -1, 1)).cast("long").alias("n_dn"),
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr(
            "CAST(CASE WHEN count(*) = 0 THEN 0"
            " ELSE 1 + sum(brk) END AS BIGINT)"
        ).alias("runs"),
    )
    var = (
        "(2.0 * n_up * n_dn) * (2.0 * n_up * n_dn - n)"
        " / (CAST(n AS DOUBLE) * n * (n - 1.0))"
    )
    return c.select(
        "n_up",
        "n_dn",
        "runs",
        F.expr(
            f"CASE WHEN n_up = 0 OR n_dn = 0 OR n < 2 OR {var} <= 0.0"
            " THEN NULL"
            " ELSE round((CAST(runs AS DOUBLE)"
            " - (1.0 + 2.0 * n_up * n_dn / CAST(n AS DOUBLE)))"
            f" / sqrt({var}), 6) END"
        ).alias("z_stat"),
    )


# --------------------------------------------------------------------------
# Page–Hinkley sequential drift detector over daily mean event values
# --------------------------------------------------------------------------

#: minimum magnitude (micro-value units) a drift must exceed per step
_PH_DELTA_MICRO = 5_000
#: alarm threshold for the PH statistic (micro-value units)
_PH_LAMBDA_MICRO = 2_000_000

_PH_ORACLE = f"""
WITH d AS (
  SELECT date_trunc('day', ts) AS d,
    CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS s,
    CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
x AS (
  SELECT d, CAST(s // n AS BIGINT) AS x FROM d
),
cum AS (
  SELECT d, x,
    CAST(sum(x) OVER (ORDER BY d) // count(*) OVER (ORDER BY d) AS BIGINT)
      AS mu
  FROM x
),
u AS (
  SELECT d, x, mu,
    CAST(sum(x - mu - {_PH_DELTA_MICRO}) OVER (ORDER BY d) AS BIGINT) AS uu
  FROM cum
)
SELECT d AS day, x AS day_mean_micro,
  CAST(uu - min(uu) OVER (ORDER BY d) AS BIGINT) AS ph_micro,
  uu - min(uu) OVER (ORDER BY d) > {_PH_LAMBDA_MICRO} AS alarm
FROM u ORDER BY day
"""


@register("page_hinkley_daily_events", _PH_ORACLE)
def q_page_hinkley_daily_events(spark, sf_dir):
    """Page–Hinkley sequential drift detector over the daily mean event
    value — the ONLINE companion to the batch drift monitors
    (``value_drift_psi`` compares two fixed windows;
    ``daily_count_cusum`` watches counts): PH accumulates deviations of
    each day's mean from the running mean and alarms when the
    accumulated excess climbs λ above its historical minimum — the
    standard upward-drift detector in streaming-data literature
    (Page 1954; Gama et al. 2014 survey).

    Determinism: daily means and the running mean are integer floor
    divisions of exact micro sums (both engines `//`/`div` on BIGINT);
    the PH statistic is a pure integer window chain (cumsum, running
    min) — no float anywhere, so the alarm bit is bit-reproducible.
    δ = {_PH_DELTA_MICRO} and λ = {_PH_LAMBDA_MICRO} micro-units are
    pinned literals.

    100 TB shape: one map-side-combined daily aggregate, then ordered
    windows over the calendar-bounded |days| domain (the registry's
    single-partition daily-series device)."""
    ev = _t(spark, sf_dir, "events")
    d = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.sum(F.expr("CAST(round(value * 1000000) AS BIGINT)"))
        .cast("long")
        .alias("s"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    x = d.select("d", F.expr("CAST(s div n AS BIGINT)").alias("x"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    cum = x.select(
        "d",
        "x",
        F.expr(
            "CAST(sum(x) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING"
            " AND CURRENT ROW) div count(*) OVER (ORDER BY d ROWS BETWEEN"
            " UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)"
        ).alias("mu"),
    )
    u = cum.select(
        "d",
        "x",
        "mu",
        F.sum(F.col("x") - F.col("mu") - F.lit(_PH_DELTA_MICRO))
        .over(w)
        .cast("long")
        .alias("uu"),
    )
    return u.select(
        # render as DATE: Spark date_trunc yields TIMESTAMP, DuckDB DATE
        F.col("d").cast("date").alias("day"),
        F.col("x").alias("day_mean_micro"),
        (F.col("uu") - F.min("uu").over(w)).cast("long").alias("ph_micro"),
        (
            (F.col("uu") - F.min("uu").over(w)) > F.lit(_PH_LAMBDA_MICRO)
        ).alias("alarm"),
    ).orderBy("day")


# --------------------------------------------------------------------------
# Bhattacharyya distance between language doc-length distributions
# --------------------------------------------------------------------------

_BHAT_LANG_A = "en"
_BHAT_LANG_B = "fr"
_BHAT_BUCKET = 500

_BHAT_ORACLE = f"""
WITH h AS (
  SELECT n_chars // {_BHAT_BUCKET} AS b,
    CAST(count(CASE WHEN lang = '{_BHAT_LANG_A}' THEN 1 END) AS BIGINT) AS ca,
    CAST(count(CASE WHEN lang = '{_BHAT_LANG_B}' THEN 1 END) AS BIGINT) AS cb
  FROM documents WHERE lang IN ('{_BHAT_LANG_A}', '{_BHAT_LANG_B}')
  GROUP BY 1
),
t AS (
  SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb FROM h
),
bc AS (
  SELECT na, nb,
    CAST(sum(CASE WHEN na = 0 OR nb = 0 THEN 0
      ELSE CAST(round(sqrt(CAST(h.ca AS DOUBLE) * h.cb
                           / (CAST(na AS DOUBLE) * nb)) * 1000000)
           AS BIGINT) END) AS BIGINT) AS bc_micro
  FROM h CROSS JOIN t GROUP BY na, nb
)
SELECT na AS n_{_BHAT_LANG_A}, nb AS n_{_BHAT_LANG_B}, bc_micro,
  CASE WHEN na = 0 OR nb = 0 OR bc_micro <= 0 THEN NULL
    ELSE round(-ln(CAST(bc_micro AS DOUBLE) / 1000000.0), 6)
  END AS bhattacharyya_distance
FROM bc
"""


@register("bhattacharyya_lang_lengths", _BHAT_ORACLE)
def q_bhattacharyya_lang_lengths(spark, sf_dir):
    """Bhattacharyya coefficient/distance between the document-length
    distributions of two pinned languages ('{_BHAT_LANG_A}' vs
    '{_BHAT_LANG_B}') over shared {_BHAT_BUCKET}-char buckets — the
    overlap-of-distributions number that complements the KS statistic
    (``length_ks_matrix`` finds the max CDF gap; BC measures total
    affinity, the quantity that bounds Bayes error between the two
    slices).

    Determinism: per-bucket sqrt(p·q) terms are IDENTICAL-text doubles
    micro-rounded per bucket, then integer-summed (order-free); the
    distance renders once from the exact bc_micro. Either language
    empty, or zero overlap, → NULL distance (ln(0) guard).

    100 TB shape: one conditional-count histogram over the bounded
    length-bucket domain, a 1-row total, broadcast cross join — the
    corpus is scanned once; everything downstream is domain-sized."""
    docs = _t(spark, sf_dir, "documents").where(
        F.col("lang").isin(_BHAT_LANG_A, _BHAT_LANG_B)
    )
    h = docs.groupBy(
        F.expr(f"n_chars div {_BHAT_BUCKET}").alias("b")
    ).agg(
        F.count(F.when(F.col("lang") == _BHAT_LANG_A, 1))
        .cast("long")
        .alias("ca"),
        F.count(F.when(F.col("lang") == _BHAT_LANG_B, 1))
        .cast("long")
        .alias("cb"),
    )
    h = h.localCheckpoint(eager=True)
    t = h.agg(
        F.sum("ca").cast("long").alias("na"),
        F.sum("cb").cast("long").alias("nb"),
    )
    bc = (
        h.crossJoin(F.broadcast(t))
        .groupBy("na", "nb")
        .agg(
            F.sum(
                F.expr(
                    "CASE WHEN na = 0 OR nb = 0 THEN 0"
                    " ELSE CAST(round(sqrt(CAST(ca AS DOUBLE) * cb"
                    " / (CAST(na AS DOUBLE) * nb)) * 1000000) AS BIGINT) END"
                )
            )
            .cast("long")
            .alias("bc_micro")
        )
    )
    return bc.select(
        F.col("na").alias(f"n_{_BHAT_LANG_A}"),
        F.col("nb").alias(f"n_{_BHAT_LANG_B}"),
        "bc_micro",
        F.expr(
            "CASE WHEN na = 0 OR nb = 0 OR bc_micro <= 0 THEN NULL"
            " ELSE round(-ln(CAST(bc_micro AS DOUBLE) / 1000000.0), 6) END"
        ).alias("bhattacharyya_distance"),
    )


# --------------------------------------------------------------------------
# per-source KL divergence to the corpus unigram distribution
# --------------------------------------------------------------------------

_KL_VOCAB = 128

#: per-token KL contribution in NANO-nats, rounded BEFORE the order-free
#: integer sum (the JSD device): ps/pc are exact-integer ratios, so the
#: double chain is identical cross-engine and the quantization absorbs
#: ln() ulp skew.
_KL_TERM = """
CAST(round((ps * ln(ps / pc)) * 1000000000) AS BIGINT)
"""

_KL_ORACLE = f"""
WITH tk AS (
  SELECT source,
    unnest(list_filter(string_split(text, ' '), kt -> kt <> '')) AS t
  FROM documents
),
gc AS (SELECT t, CAST(count(*) AS BIGINT) AS c FROM tk GROUP BY t),
vocab AS (SELECT t, c FROM gc ORDER BY c DESC, t ASC LIMIT {_KL_VOCAB}),
sc AS (
  SELECT tk.source, tk.t, CAST(count(*) AS BIGINT) AS c
  FROM tk JOIN vocab USING (t) GROUP BY tk.source, tk.t
),
srcs AS (SELECT DISTINCT source FROM documents),
grid AS (
  SELECT s.source, v.t, coalesce(sc.c, 0) AS c, v.c AS gc
  FROM srcs s CROSS JOIN vocab v
  LEFT JOIN sc ON sc.source = s.source AND sc.t = v.t
),
den AS (
  SELECT source, CAST(sum(c) + {_KL_VOCAB} AS BIGINT) AS ds
  FROM grid GROUP BY source
),
gden AS (
  SELECT CAST(sum(c) + {_KL_VOCAB} AS BIGINT) AS dg FROM vocab
),
terms AS (
  SELECT g.source,
    {_KL_TERM
      .replace('ps', '(CAST(g.c + 1 AS DOUBLE) / CAST(d.ds AS DOUBLE))')
      .replace('pc', '(CAST(g.gc + 1 AS DOUBLE) / CAST(gd.dg AS DOUBLE))')}
      AS cm
  FROM grid g JOIN den d USING (source) CROSS JOIN gden gd
)
SELECT source, CAST(sum(cm) AS BIGINT) AS kl_nano_nats
FROM terms GROUP BY source
"""


@register("kl_source_unigram", _KL_ORACLE)
def q_kl_source_unigram(spark, sf_dir):
    """Per-source KL divergence KL(source ‖ corpus) over the shared
    top-{_KL_VOCAB} vocabulary (add-1 smoothed) — the DIRECTED
    mixture-skew audit that complements the symmetric pairwise JSD
    (``js_source_divergence``): KL to the corpus mixture is the
    per-source "surprise cost" of modeling that source with the global
    unigram LM, the quantity mixture-reweighting schemes (DoReMi-style)
    monitor per domain.

    Device: identical grid construction to the JSD query (TakeOrdered
    vocab, sources×vocab gap-filled grid, metadata-sized); each term is
    nano-nat rounded before the order-free integer sum. The corpus
    distribution derives from the SAME vocab counts, so no second
    corpus scan.

    100 TB shape: one corpus-sized token explode feeding two
    map-side-combined aggregates; everything downstream is
    |sources|·{_KL_VOCAB} cells with broadcast joins only."""
    docs = _t(spark, sf_dir, "documents")
    tk = docs.select(
        "source",
        F.explode(
            F.expr("filter(split(text, ' '), kt -> kt <> '')")
        ).alias("t"),
    )
    tk = tk.localCheckpoint(eager=True)
    gc = tk.groupBy("t").agg(F.count(F.lit(1)).cast("long").alias("c"))
    vocab = (
        gc.orderBy(F.col("c").desc(), F.col("t").asc())
        .limit(_KL_VOCAB)
        .select("t", "c")
    )
    vocab = vocab.localCheckpoint(eager=True)
    sc = (
        tk.join(F.broadcast(vocab.select("t")), "t")
        .groupBy("source", "t")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    srcs = docs.select("source").distinct()
    grid = (
        srcs.crossJoin(F.broadcast(vocab.withColumnRenamed("c", "gc")))
        .join(sc, ["source", "t"], "left")
        .select(
            "source", "t", F.coalesce("c", F.lit(0)).alias("c"), "gc"
        )
    )
    den = grid.groupBy("source").agg(
        (F.sum("c") + F.lit(_KL_VOCAB)).cast("long").alias("ds")
    )
    gden = vocab.agg(
        (F.sum("c") + F.lit(_KL_VOCAB)).cast("long").alias("dg")
    )
    term = _KL_TERM.replace(
        "ps", "(CAST(c + 1 AS DOUBLE) / CAST(ds AS DOUBLE))"
    ).replace("pc", "(CAST(gc + 1 AS DOUBLE) / CAST(dg AS DOUBLE))")
    terms = (
        grid.join(F.broadcast(den), "source")
        .crossJoin(F.broadcast(gden))
        .select("source", F.expr(term).alias("cm"))
    )
    return terms.groupBy("source").agg(
        F.sum("cm").cast("long").alias("kl_nano_nats")
    )


# --------------------------------------------------------------------------
# embedding-space isotropy audit (exact mean pairwise cosine)
# --------------------------------------------------------------------------

_ISO_ORACLE = """
WITH u AS (
  SELECT vec_id,
    CAST(round(sqrt(list_reduce(
      list_transform(embedding, iv -> CAST(iv AS DOUBLE) * CAST(iv AS DOUBLE)),
      (ia, ib) -> ia + ib)) * 1000000) AS BIGINT) AS nrm_micro,
    list_transform(embedding, iv -> CAST(iv AS DOUBLE)
      / sqrt(list_reduce(
          list_transform(embedding,
                         jv -> CAST(jv AS DOUBLE) * CAST(jv AS DOUBLE)),
          (ja, jb) -> ja + jb))) AS un
  FROM embeddings
  WHERE list_reduce(list_transform(embedding,
        kv -> CAST(kv AS DOUBLE) * CAST(kv AS DOUBLE)),
        (ka, kb) -> ka + kb) > 0
),
e AS (
  SELECT d.i AS dim, CAST(round(d.v * 1000000) AS BIGINT) AS um
  FROM u, LATERAL (
    SELECT unnest(un) AS v,
           generate_subscripts(un, 1) AS i
  ) AS d
),
per_dim AS (
  SELECT dim,
    CAST(sum(CAST(um AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sd,
    sum(CAST(um AS DECIMAL(19,0)) * um) AS sq
  FROM e GROUP BY dim
),
tot AS (
  SELECT
    (SELECT CAST(count(*) AS BIGINT) FROM u) AS n,
    (SELECT CAST(count(*) AS BIGINT) FROM per_dim) AS dim,
    (SELECT CAST(sum(nrm_micro) AS BIGINT) FROM u) AS nrm_sum,
    CAST(sum(CAST(sd AS DECIMAL(38,0)) * sd) AS DOUBLE) AS ss,
    CAST(sum(sq) AS DOUBLE) AS sq
  FROM per_dim
)
SELECT n AS n_vecs, dim,
  CASE WHEN n = 0 THEN NULL
       ELSE CAST(nrm_sum // n AS BIGINT) END AS mean_norm_micro,
  CASE WHEN n < 2 THEN NULL
    ELSE round((ss - sq) / (CAST(n AS DOUBLE) * (n - 1.0)) / 1e12, 6)
  END AS mean_pairwise_cos
FROM tot
"""


@register("embedding_isotropy_stats", _ISO_ORACLE)
def q_embedding_isotropy_stats(spark, sf_dir):
    """Embedding-space isotropy audit: the EXACT mean pairwise cosine
    over ALL N² ordered pairs of unit-normalized embeddings — computed
    WITHOUT the pair join, via the Gram identity
    Σ_{{d≠e}} cos(d,e) = ‖Σ_d u_d‖² − Σ_d ‖u_d‖². An anisotropic space
    (mean cosine ≫ 0, the "narrow cone" of Ethayarajh 2019) breaks
    cosine thresholds used by the dedup/ANN tiers; this is the one-number
    gate to run before trusting them.

    Determinism: per-vector norms fold over the FIXED element order
    (F.aggregate ≡ list_reduce, the MMD float32→DOUBLE rule); normalized
    components micro-round to exact integers; per-dimension sums and the
    Gram total go through DECIMAL(38,0) (micro-components sum to
    data-sized × 10⁶ — the r10 overflow rule). One double render at the
    end; empty / single-vector inputs → NULL per the degenerate rule
    (zero-norm vectors drop on BOTH engines first).

    100 TB shape: one scan, one posexplode to (dim, component) keyed by
    the BOUNDED dim domain (64 groups — map-side combined), one 1-row
    roll-up. No pair join, no shuffle proportional to N²."""
    emb = ensure_parallelism(_t(spark, sf_dir, "embeddings"))
    nrm2 = (
        "aggregate(transform(embedding,"
        " kv -> CAST(kv AS DOUBLE) * CAST(kv AS DOUBLE)),"
        " CAST(0.0 AS DOUBLE), (ka, kb) -> ka + kb)"
    )
    u = emb.where(F.expr(f"{nrm2} > 0")).select(
        "vec_id",
        F.expr(f"CAST(round(sqrt({nrm2}) * 1000000) AS BIGINT)").alias(
            "nrm_micro"
        ),
        F.expr(
            "transform(embedding, iv -> CAST(iv AS DOUBLE)"
            f" / sqrt({nrm2}))"
        ).alias("un"),
    )
    u = u.localCheckpoint(eager=True)
    e = u.select(
        F.posexplode("un").alias("i", "v")
    ).select(
        (F.col("i") + 1).alias("dim"),
        F.expr("CAST(round(v * 1000000) AS BIGINT)").alias("um"),
    )
    per_dim = e.groupBy("dim").agg(
        F.expr("CAST(sum(CAST(um AS DECIMAL(38,0))) AS DECIMAL(38,0))").alias(
            "sd"
        ),
        F.expr("sum(CAST(um AS DECIMAL(19,0)) * um)").alias("sq"),
    )
    base = u.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("nrm_micro").cast("long").alias("nrm_sum"),
    )
    gram = per_dim.agg(
        F.count(F.lit(1)).cast("long").alias("dim"),
        F.expr("CAST(sum(CAST(sd AS DECIMAL(38,0)) * sd) AS DOUBLE)").alias(
            "ss"
        ),
        F.expr("CAST(sum(sq) AS DOUBLE)").alias("sq"),
    )
    tot = base.crossJoin(F.broadcast(gram))
    return tot.select(
        F.col("n").alias("n_vecs"),
        "dim",
        F.expr(
            "CASE WHEN n = 0 THEN NULL"
            " ELSE CAST(nrm_sum div n AS BIGINT) END"
        ).alias("mean_norm_micro"),
        F.expr(
            "CASE WHEN n < 2 THEN NULL"
            " ELSE round((ss - sq) / (CAST(n AS DOUBLE) * (n - 1.0))"
            " / 1e12, 6) END"
        ).alias("mean_pairwise_cos"),
    )


# --------------------------------------------------------------------------
# calibration bins + Brier score of a pinned linear scorer
# --------------------------------------------------------------------------

#: pinned piecewise-linear scorer p = clamp(0.5 + (price-150000)/600000):
#: every op is an IEEE basic operation (no exp/ln), so p is bit-identical
#: cross-engine BEFORE micro-rounding — a stand-in for a model-score
#: column in production
_CAL_P_DD = (
    "CAST(round(least(greatest("
    "0.5 + (o_totalprice - 150000.0) / 600000.0, 0.0), 1.0) * 1000000)"
    " AS BIGINT)"
)

_CAL_ORACLE = f"""
WITH s AS (
  SELECT {_CAL_P_DD} AS pm,
    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
  FROM orders
),
b AS (
  SELECT least(pm // 100000, 9) AS bin, pm, y,
    CAST(pm - y * 1000000 AS BIGINT) AS e
  FROM s
),
g AS (
  SELECT bin,
    CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CAST(pm AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sp,
    CAST(sum(y) AS BIGINT) AS sy,
    sum(CAST(e AS DECIMAL(19,0)) * e) AS se2
  FROM b GROUP BY bin
)
SELECT CAST(bin AS BIGINT) AS bin, n AS n_orders,
  CAST(CAST(sp AS HUGEINT) // n AS BIGINT) AS mean_pred_ppm,
  CAST(sy * 1000000 // n AS BIGINT) AS event_rate_ppm,
  abs(CAST(CAST(sp AS HUGEINT) // n AS BIGINT)
      - CAST(sy * 1000000 // n AS BIGINT)) AS abs_gap_ppm,
  CAST(CAST(sum(se2) OVER () AS HUGEINT)
       // (CAST(sum(n) OVER () AS HUGEINT) * 1000000) AS BIGINT)
    AS brier_ppm
FROM g ORDER BY bin
"""


@register("brier_calibration_bins", _CAL_ORACLE)
def q_brier_calibration_bins(spark, sf_dir):
    """Calibration-by-bins reliability table + Brier score for a pinned
    linear scorer predicting order fulfilment — the model-eval gate that
    complements ``value_purchase_auc`` (ranking quality): a model can
    rank perfectly yet be mis-calibrated, and the per-bin
    predicted-vs-empirical gap is what probability consumers (mixture
    samplers, quality thresholds) actually feel.

    Determinism: the scorer is a CLAMPED LINEAR map (IEEE basic ops
    only — no exp), micro-rounded to integer pm; bins are integer floor
    divisions; per-bin mean prediction and event rate are HUGEINT/`div`
    floor divisions of exact sums; squared errors (pm − y·10⁶)² are
    exact BIGINT per row, summed in DECIMAL (corpus-sized — the r10
    rule), and the global Brier renders as one integer floor division
    (echoed per row via a window over the ≤10-row bin table).

    100 TB shape: one map-side-combined aggregate keyed by the 10-bin
    domain; the window runs over ≤10 rows."""
    orders = _t(spark, sf_dir, "orders")
    pm = F.expr(
        "CAST(round(least(greatest("
        "0.5 + (o_totalprice - 150000.0) / 600000.0, 0.0), 1.0) * 1000000)"
        " AS BIGINT)"
    )
    s = orders.select(
        pm.alias("pm"),
        F.expr(
            "CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END"
        ).alias("y"),
    )
    b = s.select(
        F.expr("least(pm div 100000, 9)").alias("bin"),
        "pm",
        "y",
        F.expr("CAST(pm - y * 1000000 AS BIGINT)").alias("e"),
    )
    g = b.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr("CAST(sum(CAST(pm AS DECIMAL(38,0))) AS DECIMAL(38,0))").alias(
            "sp"
        ),
        F.sum("y").cast("long").alias("sy"),
        F.expr("sum(CAST(e AS DECIMAL(19,0)) * e)").alias("se2"),
    )
    w = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # ADVICE r11: brier_ppm must be a truncating integer division like its
    # siblings — true division + cast('long') rounds HALF_UP at the decimal
    # result scale before the cast, an off-by-one ppm vs the oracle's
    # HUGEINT floor on adversarial sums. Stage the two window totals as
    # columns so the final projection is the same `div` device as the rest.
    staged = g.select(
        "bin",
        "n",
        "sp",
        "sy",
        F.sum("se2").over(w).alias("__se2t"),
        (F.sum("n").over(w).cast("decimal(38,0)") * F.lit(1_000_000)).alias(
            "__dent"
        ),
    )
    return staged.select(
        F.col("bin").cast("long").alias("bin"),
        F.col("n").alias("n_orders"),
        F.expr("CAST(sp div n AS BIGINT)").alias("mean_pred_ppm"),
        F.expr("CAST(sy * 1000000 div n AS BIGINT)").alias("event_rate_ppm"),
        F.expr(
            "abs(CAST(sp div n AS BIGINT)"
            " - CAST(sy * 1000000 div n AS BIGINT))"
        ).alias("abs_gap_ppm"),
        F.expr("CAST(__se2t div __dent AS BIGINT)").alias("brier_ppm"),
    ).orderBy("bin")


# --------------------------------------------------------------------------
# Wilcoxon signed-rank test over per-user first/second-half value means
# --------------------------------------------------------------------------

_WSR_SPLIT = "2024-01-16"

_WSR_ORACLE = f"""
WITH u AS (
  SELECT user_id,
    CAST(sum(CASE WHEN ts < TIMESTAMP '{_WSR_SPLIT}'
        THEN CAST(round(value * 1000000) AS BIGINT) END) AS BIGINT) AS s1,
    CAST(count(CASE WHEN ts < TIMESTAMP '{_WSR_SPLIT}' THEN 1 END)
        AS BIGINT) AS n1,
    CAST(sum(CASE WHEN ts >= TIMESTAMP '{_WSR_SPLIT}'
        THEN CAST(round(value * 1000000) AS BIGINT) END) AS BIGINT) AS s2,
    CAST(count(CASE WHEN ts >= TIMESTAMP '{_WSR_SPLIT}' THEN 1 END)
        AS BIGINT) AS n2
  FROM events GROUP BY user_id
),
d AS (
  SELECT CAST(CAST(s2 AS HUGEINT) * 1000000 // n2
            - CAST(s1 AS HUGEINT) * 1000000 // n1 AS BIGINT) AS dd
  FROM u WHERE n1 > 0 AND n2 > 0
),
nz AS (SELECT dd, abs(dd) AS ad FROM d WHERE dd <> 0),
h AS (
  SELECT ad,
    CAST(count(*) AS BIGINT) AS cnt,
    CAST(count(CASE WHEN dd > 0 THEN 1 END) AS BIGINT) AS pos
  FROM nz GROUP BY ad
),
r AS (
  SELECT ad, cnt, pos,
    2 * coalesce(sum(cnt) OVER (ORDER BY ad
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      + cnt + 1 AS r2
  FROM h
),
s AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS n,
    sum(CAST(pos AS DECIMAL(19,0)) * r2) AS w2p,
    sum(CAST(cnt AS DECIMAL(19,0)) * cnt * cnt - cnt) AS tie_cubes
  FROM r
)
SELECT n AS n_pairs, CAST(w2p AS BIGINT) AS w2_plus,
  CASE WHEN n IS NULL OR n < 2
      OR (CAST(n AS DOUBLE) * (n + 1.0) * (2.0 * n + 1.0)) / 24.0
         - CAST(tie_cubes AS DOUBLE) / 48.0 <= 0.0 THEN NULL
    ELSE round((CAST(w2p AS DOUBLE) / 2.0
        - CAST(n AS DOUBLE) * (n + 1.0) / 4.0)
      / sqrt((CAST(n AS DOUBLE) * (n + 1.0) * (2.0 * n + 1.0)) / 24.0
             - CAST(tie_cubes AS DOUBLE) / 48.0), 6)
  END AS z_stat
FROM s
"""


@register("wilcoxon_signed_rank_users", _WSR_ORACLE)
def q_wilcoxon_signed_rank_users(spark, sf_dir):
    """Wilcoxon signed-rank test on PAIRED per-user mean event values
    (first vs second half of the observation window, split at
    {_WSR_SPLIT}) — the paired companion to ``mann_whitney_u_events``
    (independent samples) and the nonparametric alternative to a paired
    t-test: did the typical user's value level move, crediting each user
    once regardless of event volume?

    Determinism: per-user means are HUGEINT/`div` floor divisions of
    exact micro sums (no double means); zero differences drop (the
    standard convention); |d| ranks come from the VALUE HISTOGRAM with
    doubled midranks (the MWU device — never a global sort); W⁺ and the
    tie term are DECIMAL-product sums; z renders once with n<2 /
    zero-variance NULL guards.

    100 TB shape: one conditional aggregate keyed by user (the only
    data-sized shuffle), then histogram + window over the |distinct
    differences| domain, one roll-up."""
    ev = _t(spark, sf_dir, "events")
    vm = F.expr("CAST(round(value * 1000000) AS BIGINT)")
    lt = F.col("ts") < F.lit(_WSR_SPLIT).cast("timestamp")
    u = ev.groupBy("user_id").agg(
        F.sum(F.when(lt, vm)).cast("long").alias("s1"),
        F.count(F.when(lt, 1)).cast("long").alias("n1"),
        F.sum(F.when(~lt, vm)).cast("long").alias("s2"),
        F.count(F.when(~lt, 1)).cast("long").alias("n2"),
    )
    d = u.where((F.col("n1") > 0) & (F.col("n2") > 0)).select(
        F.expr(
            "CAST(CAST(s2 AS DECIMAL(38,0)) * 1000000 div n2"
            " - CAST(s1 AS DECIMAL(38,0)) * 1000000 div n1 AS BIGINT)"
        ).alias("dd")
    )
    nz = d.where(F.col("dd") != 0).select(
        "dd", F.abs("dd").alias("ad")
    )
    h = nz.groupBy("ad").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.count(F.when(F.col("dd") > 0, 1)).cast("long").alias("pos"),
    )
    wlt = Window.orderBy("ad").rowsBetween(Window.unboundedPreceding, -1)
    r = h.select(
        "ad",
        "cnt",
        "pos",
        (
            2 * F.coalesce(F.sum("cnt").over(wlt), F.lit(0))
            + F.col("cnt")
            + 1
        ).alias("r2"),
    )
    s = r.agg(
        F.sum("cnt").cast("long").alias("n"),
        F.expr("sum(CAST(pos AS DECIMAL(19,0)) * r2)").alias("w2p"),
        F.expr("sum(CAST(cnt AS DECIMAL(19,0)) * cnt * cnt - cnt)").alias(
            "tie_cubes"
        ),
    )
    var = (
        "(CAST(n AS DOUBLE) * (n + 1.0) * (2.0 * n + 1.0)) / 24.0"
        " - CAST(tie_cubes AS DOUBLE) / 48.0"
    )
    return s.select(
        F.col("n").alias("n_pairs"),
        F.col("w2p").cast("long").alias("w2_plus"),
        F.expr(
            f"CASE WHEN n IS NULL OR n < 2 OR {var} <= 0.0 THEN NULL"
            " ELSE round((CAST(w2p AS DOUBLE) / 2.0"
            " - CAST(n AS DOUBLE) * (n + 1.0) / 4.0)"
            f" / sqrt({var}), 6) END"
        ).alias("z_stat"),
    )


# --------------------------------------------------------------------------
# Brown–Forsythe homogeneity-of-variance test across event types
# --------------------------------------------------------------------------

_BF_ORACLE = """
WITH v AS (
  -- NULL values are not measurements (they would land on opposite ends
  -- of the engines' default null ordering in the median window)
  SELECT event_type,
    CAST(round(value * 1000000) AS BIGINT) AS vm
  FROM events WHERE value IS NOT NULL
),
h AS (
  SELECT event_type, vm, CAST(count(*) AS BIGINT) AS cnt
  FROM v GROUP BY event_type, vm
),
cum AS (
  SELECT event_type, vm, cnt,
    sum(cnt) OVER (PARTITION BY event_type ORDER BY vm
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
    sum(cnt) OVER (PARTITION BY event_type) AS ng
  FROM h
),
med AS (
  SELECT event_type, min(vm) AS med
  FROM cum WHERE cum >= (ng + 1) // 2 GROUP BY event_type
),
z AS (
  SELECT v.event_type, abs(v.vm - m.med) AS z
  FROM v JOIN med m USING (event_type)
),
g AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS ng,
    CAST(sum(CAST(z AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sz,
    sum(CAST(z AS DECIMAL(19,0)) * z) AS szz
  FROM z GROUP BY event_type
),
folded AS (
  SELECT CAST(count(*) AS BIGINT) AS k,
    CAST(sum(ng) AS BIGINT) AS n,
    CAST(sum(CAST(sz AS DECIMAL(38,0))) AS DOUBLE) AS st,
    list_reduce(list_transform(
      list(CAST(sz AS DOUBLE) / ng * CAST(sz AS DOUBLE) ORDER BY event_type),
      bt -> bt + 0.0), (ba, bb) -> ba + bb) AS gterm,
    list_reduce(list_transform(
      list(CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE) / ng * CAST(sz AS DOUBLE)
           ORDER BY event_type),
      wt -> wt + 0.0), (wa, wb) -> wa + wb) AS wterm
  FROM g
)
SELECT n AS n_events, k AS k_groups,
  CASE WHEN k <= 1 OR n <= k THEN NULL
    ELSE round(gterm - st * st / n, 6) END AS ss_between,
  CASE WHEN k <= 1 OR n <= k THEN NULL
    ELSE round(wterm, 6) END AS ss_within,
  CASE WHEN k <= 1 OR n <= k OR wterm <= 0.0 THEN NULL
    ELSE round(((gterm - st * st / n) / (CAST(k AS DOUBLE) - 1.0))
      / (wterm / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))), 6)
  END AS f_stat
FROM folded
"""


@register("brown_forsythe_events", _BF_ORACLE)
def q_brown_forsythe_events(spark, sf_dir):
    """Brown–Forsythe test for homogeneity of variances across event
    types — the robust (median-centered) Levene test that must pass
    before trusting the pooled-variance assumptions baked into
    ``weekday_anova_events``'s F test: ANOVA answers "do means differ",
    BF answers "is comparing them with one pooled variance even valid",
    using |x − median_g| deviations so heavy tails don't masquerade as
    variance differences.

    Devices: per-group EXACT medians from cumulative value histograms
    (never a sort — the weighted_median device, partitioned by group);
    deviations are exact integers; per-group (n, Σz, Σz²) go through
    DECIMAL sums (r10 overflow rule); the two cross-group float
    reductions fold LEFT-TO-RIGHT over event_type-sorted arrays (the
    weekday-ANOVA device), and the F ratio is a one-row double chain
    with k≤1 / degenerate-variance NULL guards.

    100 TB shape: histogram aggregate keyed by (type, value-domain),
    median via a window over the domain-bounded histogram, one broadcast
    join of ≤|types| medians back onto the scan, one grouped + one 1-row
    aggregate."""
    ev = _t(spark, sf_dir, "events")
    # NULL values excluded in both arms (see oracle comment)
    v = ev.where(F.col("value").isNotNull()).select(
        "event_type",
        F.expr("CAST(round(value * 1000000) AS BIGINT)").alias("vm"),
    )
    h = v.groupBy("event_type", "vm").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    wc = (
        Window.partitionBy("event_type")
        .orderBy("vm")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wg = Window.partitionBy("event_type")
    cum = h.select(
        "event_type",
        "vm",
        F.sum("cnt").over(wc).alias("cum"),
        F.sum("cnt").over(wg).alias("ng"),
    )
    med = (
        cum.where(F.expr("cum >= (ng + 1) div 2"))
        .groupBy("event_type")
        .agg(F.min("vm").alias("med"))
    )
    z = v.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("vm") - F.col("med")).alias("z")
    )
    g = z.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("ng"),
        F.expr("CAST(sum(CAST(z AS DECIMAL(38,0))) AS DECIMAL(38,0))").alias(
            "sz"
        ),
        F.expr("sum(CAST(z AS DECIMAL(19,0)) * z)").alias("szz"),
    )
    folded = g.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("ng").cast("long").alias("n"),
        F.expr("CAST(sum(CAST(sz AS DECIMAL(38,0))) AS DOUBLE)").alias("st"),
        F.expr(
            "aggregate(transform(array_sort(collect_list(named_struct("
            "'event_type', event_type, 'sz', CAST(sz AS DOUBLE),"
            " 'ng', ng))), bx -> bx.sz / bx.ng * bx.sz),"
            " CAST(0.0 AS DOUBLE), (ba, bb) -> ba + bb)"
        ).alias("gterm"),
        F.expr(
            "aggregate(transform(array_sort(collect_list(named_struct("
            "'event_type', event_type, 'szz', CAST(szz AS DOUBLE),"
            " 'sz', CAST(sz AS DOUBLE), 'ng', ng))),"
            " wx -> wx.szz - wx.sz / wx.ng * wx.sz),"
            " CAST(0.0 AS DOUBLE), (wa, wb) -> wa + wb)"
        ).alias("wterm"),
    )
    return folded.select(
        F.col("n").alias("n_events"),
        F.col("k").alias("k_groups"),
        F.expr(
            "CASE WHEN k <= 1 OR n <= k THEN NULL"
            " ELSE round(gterm - st * st / n, 6) END"
        ).alias("ss_between"),
        F.expr(
            "CASE WHEN k <= 1 OR n <= k THEN NULL"
            " ELSE round(wterm, 6) END"
        ).alias("ss_within"),
        F.expr(
            "CASE WHEN k <= 1 OR n <= k OR wterm <= 0.0 THEN NULL"
            " ELSE round(((gterm - st * st / n)"
            " / (CAST(k AS DOUBLE) - 1.0))"
            " / (wterm / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))), 6)"
            " END"
        ).alias("f_stat"),
    )
