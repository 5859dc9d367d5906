"""Robust / forensic statistics + probabilistic record linkage (round 6).

Eight queries extending the analytics tier with devices the earlier
families don't cover:

- ``record_linkage_scores`` — Fellegi–Sunter probabilistic record
  linkage over the customer table: candidate pairs come from the
  audited pigeonhole-banded fuzzy join (``operators/fuzzy`` — the
  all-pairs plan never exists), then each pair is scored by a fixed
  agreement-weight vector (log2(m/u) match weights in fixed-point
  MICRO units) over name / segment / balance agreement, and classified
  match / possible / non-match.  The blocking+scoring split is exactly
  how production linkage engines (Splink-style) structure the problem.
- ``seasonal_daily_decomposition`` — classical ratio-to-moving-average
  decomposition of the daily event series: centered 7-day trend via a
  ROWS window, detrended ratios in integer ppm, seasonal index per
  ISO weekday.  ALL-INTEGER arithmetic (ppm ratios use BIGINT DIV), so
  the result is partition-layout-invariant by construction.
- ``theil_sen_revenue_trend`` — the robust (median-of-pairwise-slopes)
  complement of ``regr_trend_by_nation``'s OLS fit, over monthly
  revenue per nation.  The slope-pair frame is bounded by CALENDAR ×
  NATIONS (≤ 25 · C(84,2) rows at any corpus size), so the exact
  percentile over it is scale-safe; monthly revenue is summed in
  exact decimals before any double appears.
- ``dim_label_mutual_info`` — per-dimension mutual information between
  the embedding sign bit and the class label: the information-theoretic
  feature-relevance audit (which dimensions carry label signal at all).
  One integer count aggregate over (dim, label, sign) cells; per-cell
  log terms are rounded to MICRO-nats BEFORE the order-free integer
  sum, so no float fold order exists.
- ``benford_order_values`` — Benford first-significant-digit screen
  over order totals: the classic data-forensics test for fabricated /
  truncated numeric columns.  Digit extraction is pure string/integer
  work; expected Benford shares are injected as the SAME ppm literals
  into both engines — no engine log() in the result path.
- ``pca_top_component`` — distributed PCA: exact int64 Gram aggregate
  (``operators/similarity.gram_moments``) + driver-side power iteration
  over the metadata-sized d×d covariance, mirrored bit-for-bit by a
  recursive-CTE oracle with the same pinned fold order.
- ``kaplan_meier_retention`` — survival curve of user lifetimes with
  right-censoring: integer at-risk accounting, per-step micro-log
  hazards summed exactly, one exp+round at the end.
- ``daily_count_cusum`` — offline CUSUM change-point scan of the daily
  event series in scaled integers (``cnt·D − T``), so no float mean
  ever exists.

Scale notes: linkage candidates are banded (never quadratic); the
decomposition / Theil–Sen / Benford aggregates reduce to frames bounded
by calendar × type cardinality, independent of row count; the MI count
cube is |dims| × |labels| × 2 cells.
"""

from __future__ import annotations

import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from py_datalake_move_files_spark.oracle_frags import EMB_DIM
from py_datalake_move_files_spark.oracle_frags import dd_hamming as _dd_hamming
from py_datalake_move_files_spark.queries import _t, register

# --------------------------------------------------------------------------
# Fellegi–Sunter record linkage
# --------------------------------------------------------------------------

#: Fixed agreement weights in MICRO units (log2(m/u) · 1e6, Fellegi–Sunter
#: 1969): m = P(agree | same entity), u = P(agree | different entities).
#: Pinned literals (not estimated in-query — production runs EM offline and
#: ships the weights to the scorer, which is the shape implemented here):
#:   name exact   m=.95 u≈.001  → +9.89  | name close (hdist≤2)    → +5.20
#:   segment      m=.90 u=.20   → +2.17  | disagree m=.10 u=.80    → -3.00
#:   balance ±500 m=.85 u=.10   → +3.09  | disagree m=.15 u=.90    → -2.58
_W_NAME_EXACT = 9_890_000
_W_NAME_CLOSE = 5_200_000
_W_SEG_AGREE = 2_170_000
_W_SEG_DISAGREE = -3_000_000
_W_BAL_AGREE = 3_090_000
_W_BAL_DISAGREE = -2_580_000
_BAL_EPS = 500.0
_T_MATCH = 12_000_000
_T_POSSIBLE = 6_000_000

_LINKAGE_SCORE_SQL = f"""
  (CASE WHEN hdist = 0 THEN {_W_NAME_EXACT} ELSE {_W_NAME_CLOSE} END)
  + (CASE WHEN seg_agree THEN {_W_SEG_AGREE} ELSE {_W_SEG_DISAGREE} END)
  + (CASE WHEN bal_agree THEN {_W_BAL_AGREE} ELSE {_W_BAL_DISAGREE} END)
"""

_LINKAGE_ORACLE = f"""
WITH cand AS (
  SELECT a.c_custkey AS custkey_a, b.c_custkey AS custkey_b,
         ({_dd_hamming('a.c_name', 'b.c_name')}) AS hdist,
         a.c_mktsegment = b.c_mktsegment AS seg_agree,
         abs(a.c_acctbal - b.c_acctbal) <= {_BAL_EPS} AS bal_agree
  FROM customer a JOIN customer b
    ON a.c_nationkey = b.c_nationkey
   AND a.c_custkey < b.c_custkey
   AND length(a.c_name) = length(b.c_name)
  WHERE ({_dd_hamming('a.c_name', 'b.c_name')}) <= 2
)
SELECT custkey_a, custkey_b, CAST(hdist AS INT) AS hdist,
       seg_agree, bal_agree,
       CAST({_LINKAGE_SCORE_SQL} AS BIGINT) AS score_micro,
       CASE WHEN ({_LINKAGE_SCORE_SQL}) >= {_T_MATCH} THEN 'match'
            WHEN ({_LINKAGE_SCORE_SQL}) >= {_T_POSSIBLE} THEN 'possible'
            ELSE 'non_match' END AS decision
FROM cand
"""


@register("record_linkage_scores", _LINKAGE_ORACLE)
def q_record_linkage_scores(spark, sf_dir):
    """Fellegi–Sunter linkage: banded candidates, fixed-weight scoring.

    Candidate generation reuses ``operators/fuzzy.fuzzy_hamming_pairs``
    (compound pigeonhole bands within nation — the quadratic join never
    exists; see ``fuzzy_customer_pairs`` for the measured plan story).
    Scoring is a per-pair integer expression: agreement booleans →
    log2(m/u) MICRO weights → threshold classification, so the scorer
    adds ZERO exchanges on top of the candidate join.  The oracle runs
    the naive quadratic join (fine at sf0.01) with identical weights.
    """
    from py_datalake_move_files_spark.operators.fuzzy import fuzzy_hamming_pairs

    c = _t(spark, sf_dir, "customer")
    pairs = fuzzy_hamming_pairs(
        c.select("c_custkey", "c_nationkey", "c_name"),
        "c_custkey",
        "c_name",
        group_cols=("c_nationkey",),
        max_dist=2,
        n_classes=4,
    )
    attrs = c.select("c_custkey", "c_mktsegment", "c_acctbal")
    j = (
        pairs.join(
            attrs.select(
                F.col("c_custkey").alias("key_a"),
                F.col("c_mktsegment").alias("seg_a"),
                F.col("c_acctbal").alias("bal_a"),
            ),
            "key_a",
        )
        .join(
            attrs.select(
                F.col("c_custkey").alias("key_b"),
                F.col("c_mktsegment").alias("seg_b"),
                F.col("c_acctbal").alias("bal_b"),
            ),
            "key_b",
        )
        .select(
            F.col("key_a").alias("custkey_a"),
            F.col("key_b").alias("custkey_b"),
            F.col("hdist").cast("int").alias("hdist"),
            (F.col("seg_a") == F.col("seg_b")).alias("seg_agree"),
            (F.abs(F.col("bal_a") - F.col("bal_b")) <= F.lit(_BAL_EPS)).alias(
                "bal_agree"
            ),
        )
    )
    score = (
        F.when(F.col("hdist") == 0, F.lit(_W_NAME_EXACT)).otherwise(
            F.lit(_W_NAME_CLOSE)
        )
        + F.when(F.col("seg_agree"), F.lit(_W_SEG_AGREE)).otherwise(
            F.lit(_W_SEG_DISAGREE)
        )
        + F.when(F.col("bal_agree"), F.lit(_W_BAL_AGREE)).otherwise(
            F.lit(_W_BAL_DISAGREE)
        )
    )
    return j.withColumn("score_micro", score.cast("long")).withColumn(
        "decision",
        F.when(F.col("score_micro") >= _T_MATCH, F.lit("match"))
        .when(F.col("score_micro") >= _T_POSSIBLE, F.lit("possible"))
        .otherwise(F.lit("non_match")),
    )


# --------------------------------------------------------------------------
# ratio-to-moving-average seasonal decomposition
# --------------------------------------------------------------------------

_SEASONAL_ORACLE = """
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS d,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY event_type, date_trunc('day', ts)
),
trended AS (
  SELECT event_type, d, cnt,
    sum(cnt) OVER w AS w_num,
    CAST(count(*) OVER w AS BIGINT) AS w_den
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY d
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
ratios AS (
  SELECT event_type, CAST(isodow(d) AS INT) AS iso_dow,
         cnt * 1000000 * w_den // w_num AS ratio_ppm
  FROM trended
)
SELECT event_type, iso_dow,
       CAST(count(*) AS BIGINT) AS n_days,
       CAST(sum(ratio_ppm) // count(*) AS BIGINT) AS seasonal_ppm
FROM ratios GROUP BY event_type, iso_dow
"""


@register("seasonal_daily_decomposition", _SEASONAL_ORACLE)
def q_seasonal_daily_decomposition(spark, sf_dir):
    """Ratio-to-moving-average seasonal index per (event_type, weekday).

    Three shuffles on a frame that is METADATA-SIZED from the first
    aggregate on (types × days — calendar-bounded at any corpus scale):
    daily counts → centered 7-day ROWS window for the trend → detrended
    ratio in integer ppm (``cnt·1e6·w_den DIV w_num`` — the trend
    division never leaves integers) → per-weekday mean, again via
    BIGINT DIV.  No float ever enters, so the decomposition is
    partition-invariant by construction.  Overflow bound: the ppm
    product stays under 2^63 while per-(type, day) counts are < ~1.3e12
    — beyond 100 TB daily volumes for a single event type.
    """
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    w = Window.partitionBy("event_type").orderBy("d").rowsBetween(-3, 3)
    trended = daily.select(
        "event_type",
        "d",
        "cnt",
        F.sum("cnt").over(w).alias("w_num"),
        F.count(F.lit(1)).over(w).cast("long").alias("w_den"),
    )
    ratios = trended.select(
        "event_type",
        (F.expr("weekday(d)") + F.lit(1)).cast("int").alias("iso_dow"),
        F.expr("cnt * 1000000 * w_den DIV w_num").alias("ratio_ppm"),
    )
    return ratios.groupBy("event_type", "iso_dow").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.expr("CAST(sum(ratio_ppm) DIV count(*) AS BIGINT)").alias(
            "seasonal_ppm"
        ),
    )


# --------------------------------------------------------------------------
# Theil–Sen robust trend
# --------------------------------------------------------------------------

_THEIL_SEN_ORACLE = """
WITH monthly AS (
  SELECT n.n_name,
         CAST(year(o.o_orderdate) * 12 + month(o.o_orderdate) AS BIGINT)
           AS mkey,
         sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY n.n_name, year(o.o_orderdate) * 12 + month(o.o_orderdate)
),
slopes AS (
  SELECT a.n_name,
         (CAST(b.rev AS DOUBLE) - CAST(a.rev AS DOUBLE))
           / CAST(b.mkey - a.mkey AS DOUBLE) AS slope
  FROM monthly a JOIN monthly b
    ON a.n_name = b.n_name AND a.mkey < b.mkey
)
SELECT n_name,
       CAST((SELECT count(*) FROM monthly m WHERE m.n_name = s.n_name)
         AS BIGINT) AS n_months,
       CAST(count(*) AS BIGINT) AS n_pairs,
       round(quantile_cont(slope, 0.5), 6) AS theil_sen_slope
FROM slopes s GROUP BY n_name
"""


@register("theil_sen_revenue_trend", _THEIL_SEN_ORACLE)
def q_theil_sen_revenue_trend(spark, sf_dir):
    """Theil–Sen (median of pairwise slopes) monthly-revenue trend per
    nation — the outlier-robust complement of ``regr_trend_by_nation``.

    Scale shape: the only corpus-sized work is ONE aggregate to monthly
    revenue (decimal sums — exact before any double); everything after
    runs on a frame bounded by nations × calendar months (≤ 25 × 80
    here), so the within-nation pair join and the exact interpolated
    median (``percentile`` ≡ DuckDB ``quantile_cont``) operate on at
    most C(80,2) rows per nation REGARDLESS of corpus size — the
    value-buffering percentile is safe because the calendar bounds it,
    the same argument as the behavioral quartile family.

    The monthly frame is lineage-cut (eager ``localCheckpoint`` — the
    kNN-tier device): three downstream branches (both pair sides + the
    month counts) reference it, and without the cut Catalyst re-derives
    the 3-table join per branch — 9 FileScans for a metadata-sized
    intermediate; with it, 3.
    """
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    monthly = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy(
            "n_name",
            (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
            .cast("long")
            .alias("mkey"),
        )
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    ).localCheckpoint(eager=True)
    a = monthly.select(
        "n_name",
        F.col("mkey").alias("mkey_a"),
        F.col("rev").cast("double").alias("rev_a"),
    )
    b = monthly.select(
        F.col("n_name").alias("n_name_b"),
        F.col("mkey").alias("mkey_b"),
        F.col("rev").cast("double").alias("rev_b"),
    )
    slopes = a.join(
        b,
        (F.col("n_name") == F.col("n_name_b"))
        & (F.col("mkey_a") < F.col("mkey_b")),
    ).select(
        "n_name",
        (
            (F.col("rev_b") - F.col("rev_a"))
            / (F.col("mkey_b") - F.col("mkey_a")).cast("double")
        ).alias("slope"),
    )
    months = monthly.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_months")
    )
    med = slopes.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.round(F.expr("percentile(slope, 0.5)"), 6).alias("theil_sen_slope"),
    )
    return months.join(med, "n_name").select(
        "n_name", "n_months", "n_pairs", "theil_sen_slope"
    )


# --------------------------------------------------------------------------
# per-dimension mutual information (embedding sign bit vs label)
# --------------------------------------------------------------------------

_MI_ORACLE = f"""
WITH ex AS (
  SELECT u.dim - 1 AS dim,
         CASE WHEN embedding[u.dim] >= 0 THEN 1 ELSE 0 END AS bin,
         label
  FROM embeddings,
       unnest(generate_series(1, {EMB_DIM})) AS u(dim)
),
cells AS (
  SELECT dim, label, bin, CAST(count(*) AS BIGINT) AS c
  FROM ex GROUP BY dim, label, bin
),
marg AS (
  SELECT dim, label, bin, c,
    sum(c) OVER (PARTITION BY dim, label) AS c_l,
    sum(c) OVER (PARTITION BY dim, bin) AS c_b,
    sum(c) OVER (PARTITION BY dim) AS n
  FROM cells
),
contrib AS (
  SELECT dim, n,
    CAST(round(c * ln((CAST(c AS DOUBLE) * n) / (CAST(c_l AS DOUBLE) * c_b))
               * 1000000) AS BIGINT) AS cm
  FROM marg
)
SELECT CAST(dim AS INT) AS dim, CAST(max(n) AS BIGINT) AS n,
       CAST(sum(cm) // max(n) AS BIGINT) AS mi_micro_nats
FROM contrib GROUP BY dim
"""


@register("dim_label_mutual_info", _MI_ORACLE)
def q_dim_label_mutual_info(spark, sf_dir):
    """Mutual information I(sign(x_d); label) per embedding dimension —
    the feature-relevance audit: dimensions with ~0 MI carry no label
    signal; a few high-MI dimensions suggest a shortcut direction.

    One posexplode + ONE integer count aggregate build the (dim, label,
    sign) cell cube — |dims|·|labels|·2 cells regardless of corpus size;
    marginals are window sums over that tiny cube.  Per-cell log terms
    are rounded to MICRO-nats BEFORE the integer sum (the repo's
    micro-unit device), so the only float work is one deterministic
    per-cell expression and no float fold order exists; the 1e-6
    quantization absorbs cross-engine ln() ulp differences.
    """
    emb = _t(spark, sf_dir, "embeddings")
    ex = emb.select(
        "label", F.posexplode("embedding").alias("dim", "val")
    ).select(
        "dim",
        "label",
        F.when(F.col("val") >= 0, F.lit(1)).otherwise(F.lit(0)).alias("bin"),
    )
    cells = ex.groupBy("dim", "label", "bin").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    marg = cells.select(
        "dim",
        "c",
        F.sum("c").over(Window.partitionBy("dim", "label")).alias("c_l"),
        F.sum("c").over(Window.partitionBy("dim", "bin")).alias("c_b"),
        F.sum("c").over(Window.partitionBy("dim")).alias("n"),
    )
    contrib = marg.select(
        "dim",
        "n",
        F.round(
            F.col("c")
            * F.log(
                (F.col("c").cast("double") * F.col("n"))
                / (F.col("c_l").cast("double") * F.col("c_b"))
            )
            * F.lit(1_000_000)
        )
        .cast("long")
        .alias("cm"),
    )
    return contrib.groupBy(F.col("dim").cast("int").alias("dim")).agg(
        F.max("n").cast("long").alias("n"),
        F.expr("CAST(sum(cm) DIV max(n) AS BIGINT)").alias("mi_micro_nats"),
    )


# --------------------------------------------------------------------------
# Benford first-digit screen
# --------------------------------------------------------------------------

#: Expected Benford shares log10(1 + 1/d) in ppm — the SAME literals are
#: injected into both engines (computed once here, no engine log10).
_BENFORD_PPM = {
    d: int(round(math.log10(1 + 1 / d) * 1_000_000)) for d in range(1, 10)
}

_BENFORD_CASE = (
    "CASE first_digit "
    + " ".join(f"WHEN {d} THEN {p}" for d, p in _BENFORD_PPM.items())
    + " END"
)

_BENFORD_ORACLE = f"""
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
              1, 1) AS INT) AS first_digit
  FROM orders WHERE o_totalprice >= 1
),
counts AS (
  SELECT first_digit, CAST(count(*) AS BIGINT) AS n FROM digits
  GROUP BY first_digit
)
SELECT first_digit, n,
  CAST(n * 1000000 // sum(n) OVER () AS BIGINT) AS share_ppm,
  CAST({_BENFORD_CASE} AS BIGINT) AS benford_ppm,
  CAST(n * 1000000 // sum(n) OVER () - ({_BENFORD_CASE}) AS BIGINT)
    AS dev_ppm
FROM counts
"""


@register("benford_order_values", _BENFORD_ORACLE)
def q_benford_order_values(spark, sf_dir):
    """Benford's-law first-significant-digit screen over order totals —
    the standard forensic test for fabricated or artificially bounded
    numeric columns (synthetic uniform data fails it loudly, organic
    multiplicative data passes).

    Digit extraction is string/integer only (no log10 on the data
    path); one count aggregate reduces the corpus to ≤ 9 rows, and the
    share/deviation math is integer ppm over that 9-row frame (the
    ``OVER ()`` global window is bounded by the digit alphabet, not the
    data).  Expected shares are module-level ppm literals shared with
    the oracle.
    """
    o = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") >= 1)
    digits = o.select(
        F.substring(
            F.floor(F.col("o_totalprice")).cast("long").cast("string"), 1, 1
        )
        .cast("int")
        .alias("first_digit")
    )
    counts = digits.groupBy("first_digit").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    w = Window.partitionBy()
    benford = F.expr(_BENFORD_CASE)
    return counts.select(
        "first_digit",
        "n",
        F.expr("n * 1000000").alias("__num"),
        F.sum("n").over(w).alias("__tot"),
    ).select(
        "first_digit",
        "n",
        F.expr("CAST(__num DIV __tot AS BIGINT)").alias("share_ppm"),
        benford.cast("long").alias("benford_ppm"),
        (F.expr("__num DIV __tot") - benford).cast("long").alias("dev_ppm"),
    )


# --------------------------------------------------------------------------
# distributed PCA: top principal component via cross-engine power iteration
# --------------------------------------------------------------------------

_PCA_SCALE = 1_000_000
_PCA_ITERS = 40


def _dd_matvec(vec_name: str) -> str:
    """DuckDB matvec ``m · v`` with the SAME left-to-right fold order as
    the pure-Python mirror (list_reduce seeds with the first element;
    0.0 + x == x in IEEE, so the folds agree)."""
    return (
        f"list_transform(m, r -> list_reduce("
        f"list_transform(generate_series(1, {EMB_DIM}), "
        f"jj -> r[jj] * {vec_name}[jj]), (a, b) -> a + b))"
    )


_PCA_ORACLE = f"""
WITH RECURSIVE ex AS (
  SELECT vec_id, u.dim AS i,
         CAST(round(CAST(embedding[u.dim] AS DOUBLE) * {_PCA_SCALE})
              AS BIGINT) AS v
  FROM embeddings, unnest(generate_series(1, {EMB_DIM})) AS u(dim)
),
firsts AS (SELECT i, sum(v) AS sx FROM ex GROUP BY i),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings),
gup AS (
  SELECT a.i AS i, b.i AS j, sum(a.v * b.v) AS sv
  FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND b.i >= a.i
  GROUP BY a.i, b.i
),
gfull AS (
  SELECT i, j, sv FROM gup
  UNION ALL SELECT j, i, sv FROM gup WHERE i <> j
),
cells AS (
  SELECT g.i, g.j,
    (CAST(g.sv AS DOUBLE)
     - CAST(fa.sx AS DOUBLE) * CAST(fb.sx AS DOUBLE) / CAST(n.n AS DOUBLE))
    / CAST(n.n AS DOUBLE) AS c
  FROM gfull g
  JOIN firsts fa ON fa.i = g.i
  JOIN firsts fb ON fb.i = g.j
  CROSS JOIN nn n
),
rows_ AS (SELECT i, list(c ORDER BY j) AS r FROM cells GROUP BY i),
mat AS (SELECT list(r ORDER BY i) AS m FROM rows_),
it(t, v) AS (
  SELECT 0, list_transform(generate_series(1, {EMB_DIM}),
                           x -> 1.0 / sqrt({EMB_DIM}))
  UNION ALL
  SELECT t + 1, list_transform(w, x -> x / nw) FROM (
    SELECT t, {_dd_matvec('v')} AS w
    FROM it, mat WHERE t < {_PCA_ITERS}
  ), LATERAL (SELECT sqrt(list_reduce(list_transform(w, x -> x * x),
                                      (a, b) -> a + b)) AS nw)
),
fin AS (
  SELECT v,
    sqrt(list_reduce(list_transform(w, x -> x * x), (a, b) -> a + b)) AS lam
  FROM (SELECT v, {_dd_matvec('v')} AS w FROM it, mat
        WHERE t = {_PCA_ITERS})
),
tr AS (
  SELECT list_reduce(list_transform(generate_series(1, {EMB_DIM}),
                                    ii -> m[ii][ii]),
                     (a, b) -> a + b) AS trace
  FROM mat
)
SELECT CAST(u.dim - 1 AS INT) AS dim,
       round(v[u.dim], 6) AS loading,
       round(lam / 1000000000000.0, 6) AS eigenvalue,
       CAST(round(lam / trace * 1000000) AS BIGINT) AS explained_ppm
FROM fin, tr, unnest(generate_series(1, {EMB_DIM})) AS u(dim)
"""


def _fold(xs):
    """Left-to-right float fold seeded with the first element — the
    exact order both the oracle's list_reduce and this mirror use."""
    xs = list(xs)
    acc = xs[0]
    for x in xs[1:]:
        acc = acc + x
    return acc


@register("pca_top_component", _PCA_ORACLE)
def q_pca_top_component(spark, sf_dir):
    """Top principal component of the embedding matrix — distributed PCA
    structured the way production systems do it: the corpus-sized work
    is ONE mergeable fixed-point moment aggregate
    (``operators/similarity.gram_moments`` — exact int64 Gram + first
    moments, d(d+1)/2 + d + 1 cells on the wire regardless of corpus
    size), and the eigensolve runs on the driver over the METADATA-sized
    d×d covariance.

    Cross-engine exactness: the covariance centering, the 40 power-
    iteration matvec/normalize steps, and the Rayleigh norm are pure
    float chains with a PINNED left-to-right fold order mirrored by the
    oracle's recursive CTE (verified bit-identical on a reference
    matrix), and integer moments remove every order-dependent sum; the
    final 6-dp/ppm rounding runs through Spark's round so both engines
    round the same way.  Returns one row per dimension: (dim, loading,
    eigenvalue, explained_ppm) with the eigenvalue in original units
    and its share of total variance in ppm.
    """
    import math

    from py_datalake_move_files_spark.operators import similarity as SIM_

    emb = _t(spark, sf_dir, "embeddings")
    d = EMB_DIM
    n, s, g = SIM_.gram_moments(emb, "embedding", dim=d, scale=_PCA_SCALE)
    if not n:
        # empty corpus: the covariance is undefined — one NULL row per
        # dimension, matching the oracle's NULL-propagating CTE chain
        # (degenerate-lake rule)
        raw = spark.createDataFrame(
            [(i,) for i in range(d)], schema="dim int"
        ).selectExpr(
            "dim",
            "CAST(NULL AS DOUBLE) AS loading",
            "CAST(NULL AS DOUBLE) AS lam",
            "CAST(NULL AS DOUBLE) AS lam_tr",
        )
        return raw.select(
            "dim",
            F.round("loading", 6).alias("loading"),
            F.round(F.col("lam") / F.lit(1_000_000_000_000.0), 6).alias(
                "eigenvalue"
            ),
            F.expr("CAST(round(lam_tr * 1000000) AS BIGINT)").alias(
                "explained_ppm"
            ),
        )

    def cov(i, j):
        key = (i, j) if i <= j else (j, i)
        return (float(g[key]) - float(s[i]) * float(s[j]) / float(n)) / float(
            n
        )

    m = [[cov(i, j) for j in range(d)] for i in range(d)]
    trace = _fold(m[i][i] for i in range(d))
    if trace == 0.0:
        # single-row / constant corpus: the covariance is the zero matrix
        # and the power iteration would divide by a zero norm — one NULL
        # row per dimension, matching the oracle's NULL chain (the
        # degenerate-lake rule; mirrors the n == 0 branch above)
        rows = [(i, None, None, None) for i in range(d)]
        raw = spark.createDataFrame(
            rows, schema="dim int, loading double, lam double, lam_tr double"
        )
        return raw.select(
            "dim",
            F.round("loading", 6).alias("loading"),
            F.round(F.col("lam") / F.lit(1_000_000_000_000.0), 6).alias(
                "eigenvalue"
            ),
            F.expr("CAST(round(lam_tr * 1000000) AS BIGINT)").alias(
                "explained_ppm"
            ),
        )
    v = [1.0 / math.sqrt(float(d))] * d
    for _ in range(_PCA_ITERS):
        w = [_fold(m[i][jj] * v[jj] for jj in range(d)) for i in range(d)]
        nw = math.sqrt(_fold(x * x for x in w))
        v = [x / nw for x in w]
    w = [_fold(m[i][jj] * v[jj] for jj in range(d)) for i in range(d)]
    lam = math.sqrt(_fold(x * x for x in w))

    rows = [(i, v[i], lam, lam / trace) for i in range(d)]
    raw = spark.createDataFrame(
        rows, schema="dim int, loading double, lam double, lam_tr double"
    )
    return raw.select(
        "dim",
        F.round("loading", 6).alias("loading"),
        F.round(F.col("lam") / F.lit(1_000_000_000_000.0), 6).alias(
            "eigenvalue"
        ),
        F.expr("CAST(round(lam_tr * 1000000) AS BIGINT)").alias(
            "explained_ppm"
        ),
    )


# --------------------------------------------------------------------------
# Kaplan-Meier retention (survival with right-censoring)
# --------------------------------------------------------------------------

#: users whose last event falls within this many days of the corpus end
#: are right-CENSORED (still active), not churned.
_KM_CENSOR_DAYS = 2
#: ln-hazard floor for the d == n_risk step (survival collapses to 0):
#: e^-138 rounds to 0.0 at 6 dp in both engines.
_KM_LN_FLOOR = -138_000_000

_KM_ORACLE = f"""
WITH bounds AS (SELECT max(date_trunc('day', ts)) AS dmax FROM events),
users AS (
  SELECT user_id,
         min(date_trunc('day', ts)) AS d0,
         max(date_trunc('day', ts)) AS d1
  FROM events GROUP BY user_id
),
durs AS (
  SELECT date_diff('day', u.d0, u.d1) AS dur,
         CASE WHEN u.d1 < b.dmax - INTERVAL {_KM_CENSOR_DAYS} DAY
              THEN 1 ELSE 0 END AS churned
  FROM users u CROSS JOIN bounds b
),
by_t AS (
  SELECT dur AS t,
         CAST(sum(churned) AS BIGINT) AS d,
         CAST(sum(1 - churned) AS BIGINT) AS c
  FROM durs GROUP BY dur
),
risk AS (
  SELECT t, d, c,
    (SELECT count(*) FROM durs)
      - coalesce(sum(d + c) OVER (ORDER BY t
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
  FROM by_t
),
terms AS (
  SELECT t, d, c, n_risk,
    CASE WHEN d >= n_risk THEN {_KM_LN_FLOOR}
         WHEN d = 0 THEN 0
         ELSE CAST(round(ln(1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE))
                         * 1000000) AS BIGINT) END AS lnm
  FROM risk
)
SELECT CAST(t AS BIGINT) AS duration_days,
       CAST(n_risk AS BIGINT) AS n_risk,
       d AS n_churned, c AS n_censored,
       round(exp(CAST(sum(lnm) OVER (ORDER BY t) AS DOUBLE) / 1000000.0), 6)
         AS survival
FROM terms
"""


@register("kaplan_meier_retention", _KM_ORACLE)
def q_kaplan_meier_retention(spark, sf_dir):
    """Kaplan-Meier survival curve of user retention with right-censoring
    — THE estimator for "how long do users stay" when the observation
    window truncates lifetimes (users still active near the corpus end
    are censored, not counted as churn; naive churn rates over-count).

    Scale shape: one aggregate to per-user (first, last) days, one
    aggregate to the duration frame — after which everything runs on a
    CALENDAR-bounded table (≤ observed span in days).  Exactness: the
    at-risk counts are integer window sums; each hazard term
    ``ln(1 - d/n)`` is rounded to MICRO units per row (1-ulp cross-
    engine ln differences are absorbed) and the cumulative product is
    an exact INTEGER cumulative sum of those micro-logs, exponentiated
    and rounded once at the end; the d == n collapse step uses a pinned
    floor instead of ln(0).
    """
    ev = _t(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))
    users = ev.groupBy("user_id").agg(
        F.min(day).alias("d0"), F.max(day).alias("d1")
    )
    bounds = ev.agg(F.max(day).alias("dmax"))
    durs = users.crossJoin(F.broadcast(bounds)).select(
        F.datediff("d1", "d0").alias("dur"),
        F.when(
            F.col("d1") < F.date_sub("dmax", _KM_CENSOR_DAYS), F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias("churned"),
    )
    by_t = durs.groupBy(F.col("dur").alias("t")).agg(
        F.sum("churned").cast("long").alias("d"),
        F.sum(F.lit(1) - F.col("churned")).cast("long").alias("c"),
    )
    total = durs.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    w_prev = (
        Window.orderBy("t")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    risk = by_t.crossJoin(F.broadcast(total)).select(
        "t",
        "d",
        "c",
        (
            F.col("n_total")
            - F.coalesce(
                F.sum(F.col("d") + F.col("c")).over(w_prev), F.lit(0)
            )
        ).alias("n_risk"),
    )
    terms = risk.withColumn(
        "lnm",
        F.when(F.col("d") >= F.col("n_risk"), F.lit(_KM_LN_FLOOR))
        .when(F.col("d") == 0, F.lit(0))
        .otherwise(
            F.round(
                F.log(
                    F.lit(1.0)
                    - F.col("d").cast("double") / F.col("n_risk").cast("double")
                )
                * 1_000_000
            ).cast("long")
        ),
    )
    w_cum = Window.orderBy("t")
    return terms.select(
        F.col("t").cast("long").alias("duration_days"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d").alias("n_churned"),
        F.col("c").alias("n_censored"),
        F.round(
            F.exp(F.sum("lnm").over(w_cum).cast("double") / F.lit(1_000_000.0)),
            6,
        ).alias("survival"),
    )


# --------------------------------------------------------------------------
# CUSUM change-point scan over the daily event series
# --------------------------------------------------------------------------

_CUSUM_ORACLE = """
WITH daily AS (
  SELECT date_trunc('day', ts) AS d, CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY date_trunc('day', ts)
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_days, CAST(sum(cnt) AS BIGINT) AS t
  FROM daily
),
cus AS (
  SELECT d, cnt,
    sum(cnt * n_days - t) OVER (ORDER BY d) AS cusum_scaled
  FROM daily CROSS JOIN tot
)
SELECT CAST(d AS DATE) AS day, cnt,
       CAST(cusum_scaled AS BIGINT) AS cusum_scaled,
       abs(cusum_scaled) = max(abs(cusum_scaled)) OVER () AS is_changepoint
FROM cus
"""


@register("daily_count_cusum", _CUSUM_ORACLE)
def q_daily_count_cusum(spark, sf_dir):
    """CUSUM change-point scan: cumulative sum of mean-deviations of the
    daily event count; the |maximum| marks the most likely level-shift
    day (the classic offline CUSUM statistic).  ALL-INTEGER: deviations
    are scaled by the day count (``cnt·D − T``) so the mean never
    becomes a float, the cumulative and max windows run over the
    CALENDAR-bounded daily frame, and the result is layout-invariant by
    construction.
    """
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", F.col("ts")).alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("cnt").cast("long").alias("t"),
    )
    cus = daily.crossJoin(F.broadcast(tot)).select(
        "d",
        "cnt",
        F.sum(F.expr("cnt * n_days - t"))
        .over(Window.orderBy("d"))
        .alias("cusum_scaled"),
    )
    return cus.select(
        F.col("d").cast("date").alias("day"),
        "cnt",
        F.col("cusum_scaled").cast("long").alias("cusum_scaled"),
        (
            F.abs("cusum_scaled")
            == F.max(F.abs("cusum_scaled")).over(Window.partitionBy())
        ).alias("is_changepoint"),
    )
