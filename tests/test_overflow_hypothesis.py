"""Property-based tests (hypothesis) for the r10 overflow-audit devices.

The r9 sf1 gate caught an int64 class — products of two DATA-SIZED
quantities rendered in BIGINT ppm — in three queries; the r10 registry-wide
audit (PLANS.md "r10 overflow audit") found three more carriers:

- ``token_burstiness``: N·Σc²·10⁶ overflowed past ~10⁸ docs → Σc² now a
  DECIMAL(38,0) sum and the VMR ppm the identical-text DOUBLES device.
- ``weekday_anova_events`` / ``hourly_autocorrelation``: Σc² of daily /
  hourly counts overflows at the 100 TB design point (~10¹³ events) →
  DECIMAL(19,0)-product sums.

These properties drive the devices with ADVERSARIALLY LARGE aggregates —
counts whose squares exceed 2⁶³, sizes no fixture at any SF can reach —
and assert (a) the expressions no longer abort, (b) Spark and DuckDB stay
bit-identical, and (c) the value is exactly right (computed in unbounded
Python ints)."""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

# counts whose squares blow int64: c² > 2⁶³ whenever c > 3.04e9
huge_counts = st.lists(
    st.integers(min_value=3_100_000_000, max_value=4_000_000_000_000),
    min_size=1,
    max_size=8,
)

# burstiness aggregates past the retired N·Σc²·10⁶ < 2⁶³ bound
# (nd·tf2·1e6 up to ~1e31, representative of 10⁹⁺-doc corpora) but
# FEASIBLE: independent draws can violate Cauchy–Schwarz (Σc² ≥ (Σc)²/N)
# and the per-doc ceiling (Σc² ≤ C_MAX·Σc, C_MAX = max doc length), and
# an infeasible triple can push the true ppm past int64 — which both
# engines rightly refuse (the first full-suite run of this test found
# exactly that: a triple with Σc²/Σc ≈ 9·10¹² is no corpus). For any
# feasible triple, vmr_ppm ≤ C_MAX·10⁶ ≈ 10¹² — well inside BIGINT.
_BURST_C_MAX = 10**6  # max per-doc count of one token ≈ max doc length


@st.composite
def _burst_aggs(draw):
    nd = draw(st.integers(min_value=10**8, max_value=10**12))
    tf = draw(
        st.integers(min_value=10**3, max_value=min(nd * _BURST_C_MAX, 10**13))
    )
    lo = -(-(tf * tf) // nd)  # ceil(Σc²min) by Cauchy–Schwarz
    hi = max(lo, min(tf * _BURST_C_MAX, tf * tf))
    tf2 = draw(st.integers(min_value=lo, max_value=hi))
    return nd, tf, tf2


burst_aggs = _burst_aggs()


def _duck_one(sql: str):
    return duckdb.connect().execute(sql).fetchone()[0]


@settings(
    max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(huge_counts)
def test_decimal_square_sum_exact_and_cross_engine(spark, vals):
    """sum(CAST(c AS DECIMAL(19,0)) * c) — the Σc² device shared by
    weekday_anova_events, hourly_autocorrelation and token_burstiness —
    is exact (vs Python bigints) and engine-identical on counts whose
    squares exceed int64."""
    df = spark.createDataFrame([(v,) for v in vals], "c long")
    got_spark = df.agg(
        F.expr("sum(CAST(c AS DECIMAL(19,0)) * c)").alias("sxx")
    ).collect()[0].sxx
    lits = ", ".join(f"({v})" for v in vals)
    got_duck = _duck_one(
        "SELECT sum(CAST(c AS DECIMAL(19,0)) * c) "
        f"FROM (VALUES {lits}) AS t(c)"
    )
    want = sum(v * v for v in vals)
    assert int(got_spark) == want
    assert int(got_duck) == want


@settings(
    max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(burst_aggs)
def test_burstiness_vmr_doubles_device_bit_identical(spark, aggs):
    """The identical-text DOUBLES ppm render of token_burstiness agrees
    bit-for-bit between engines on aggregates far past the retired BIGINT
    bound (N·Σc²·10⁶ ≈ 10³¹ here vs the old 9.2·10¹⁸ ceiling)."""
    nd, tf, tf2 = aggs
    expr = (
        "CAST(floor((CAST(nd AS DOUBLE) * CAST(tf2 AS DOUBLE)"
        " - CAST(tf AS DOUBLE) * CAST(tf AS DOUBLE)) * 1000000.0"
        " / (CAST(nd AS DOUBLE) * CAST(tf AS DOUBLE))) AS BIGINT)"
    )
    got_spark = (
        spark.createDataFrame([(nd, tf, tf2)], "nd long, tf long, tf2 long")
        .select(F.expr(expr).alias("vmr"))
        .collect()[0]
        .vmr
    )
    got_duck = _duck_one(
        f"SELECT {expr} FROM (VALUES ({nd}, {tf}, {tf2})) AS t(nd, tf, tf2)"
    )
    assert got_spark == got_duck
    # and both equal the direct IEEE evaluation
    want = math.floor(
        (float(nd) * float(tf2) - float(tf) * float(tf))
        * 1000000.0
        / (float(nd) * float(tf))
    )
    assert got_spark == want


def test_old_bigint_square_sum_would_abort(spark):
    """Regression tripwire: the RETIRED sum(c*c) BIGINT form fails loud
    under ANSI on the same adversarial counts — proving these properties
    exercise territory the old code could not survive (and that a future
    revert to BIGINT cannot pass this suite)."""
    df = spark.createDataFrame([(4_000_000_000,)], "c long")
    with pytest.raises(Exception, match="(?i)overflow"):
        df.agg(F.sum(F.col("c") * F.col("c")).alias("sxx")).collect()


# doubled midranks are data-sized (~2N): a list of rank values whose
# PLAIN sum blows int64 (Σ > 2⁶³ with few huge elements — representative
# of the ~2N² rank sum of a >2e9-doc spearman input)
huge_ranks = st.lists(
    st.integers(min_value=2_000_000_000_000_000_000,
                max_value=4_000_000_000_000_000_000),
    min_size=5,
    max_size=10,
)


@settings(
    max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(huge_ranks)
def test_decimal_rank_sum_exact_and_cross_engine(spark, vals):
    """sum(CAST(r AS DECIMAL(38,0))) — the spearman_chars_tokens rank-sum
    device (ADVICE r10: Σ of ~2N doubled midranks ≈ 2N², past int64 at
    ~2e9 docs) — is exact vs Python bigints and engine-identical on rank
    lists whose plain BIGINT sum exceeds 2⁶³."""
    df = spark.createDataFrame([(v,) for v in vals], "r long")
    got_spark = df.agg(
        F.expr("sum(CAST(r AS DECIMAL(38,0)))").alias("s")
    ).collect()[0].s
    lits = ", ".join(f"({v})" for v in vals)
    got_duck = _duck_one(
        f"SELECT sum(CAST(r AS DECIMAL(38,0))) FROM (VALUES {lits}) AS t(r)"
    )
    want = sum(vals)
    assert int(got_spark) == want
    assert int(got_duck) == want


def test_old_bigint_rank_sum_would_abort(spark):
    """Regression tripwire: the RETIRED plain BIGINT sum(r) ANSI-aborts
    on the same adversarial ranks, so a revert cannot pass this suite."""
    df = spark.createDataFrame(
        [(4_000_000_000_000_000_000,)] * 3, "r long"
    )
    with pytest.raises(Exception, match="(?i)overflow"):
        df.agg(F.sum("r").alias("s")).collect()
