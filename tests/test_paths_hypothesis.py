"""Property-based path-transform tests (hypothesis): invariants of P4-P7
over adversarial generated paths, evaluated through Spark in small batches.

Complements tests/test_paths.py's seeded-corpus equivalence check with
randomized search over the same invariants:

- qualify is idempotent and always yields a source-prefixed path;
- anchored rewrite always yields a target-prefixed path with no ``//``;
- basename never contains ``/``.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from py_datalake_move_files_spark.operators.paths import (
    basename,
    prefix_qualify,
    rewrite_prefix,
)

SRC, TGT = "lake/raw", "lake/archive"

segment = st.text(
    alphabet=st.characters(
        whitelist_categories=("Ll", "Lu", "Nd"), whitelist_characters="-_."
    ),
    min_size=1,
    max_size=8,
)
path_strategy = st.lists(segment, min_size=1, max_size=4).map("/".join)
# sometimes embed the prefix at front or mid-path
tricky = st.one_of(
    path_strategy,
    path_strategy.map(lambda p: f"{SRC}/{p}"),
    path_strategy.map(lambda p: f"x/{SRC}/{p}"),
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(tricky, min_size=1, max_size=20, unique=True))
def test_path_invariants(spark, names):
    df = spark.createDataFrame([(n,) for n in names], ["name"])
    q = prefix_qualify(F.col("name"), SRC)
    rows = df.select(
        "name",
        q.alias("q1"),
        prefix_qualify(q, SRC).alias("q2"),
        rewrite_prefix(F.col("name"), SRC, TGT).alias("rw"),
        basename(F.col("name")).alias("base"),
    ).collect()
    for r in rows:
        assert r.q1.startswith(SRC + "/") or r.q1.startswith(SRC), r.name
        assert r.q2 == r.q1, f"qualify not idempotent on {r.name!r}"
        assert r.rw.startswith(TGT + "/"), r.name
        assert "//" not in r.rw, r.name
        assert "/" not in r.base, r.name
