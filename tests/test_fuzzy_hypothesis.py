"""Property-based tests (hypothesis) for the fuzzy hamming self-join:
randomized corpora checked against a plain-Python quadratic oracle.

The banding filter is the part that can silently go wrong (a lossy band
partition drops true pairs; a degenerate one explodes candidates), so the
properties run the WHOLE operator — banding + join + verify — and compare
exact output sets, across both the single-class and compound-band schemes
and across string lengths the positional schemes historically mishandled
(short strings, shared prefixes, repeated characters, non-ASCII).

Batched: hypothesis generates corpora, each evaluated through Spark once —
small max_examples keep the suite's wall-clock sane while still searching
far beyond the hand-written fixtures.
"""

from __future__ import annotations

import itertools

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from py_datalake_move_files_spark.operators.fuzzy import fuzzy_hamming_pairs

# small alphabet on purpose: maximizes collisions, near-dups, repeated
# chars, and shared prefixes — the regimes where banding breaks
# \n included deliberately: Java-regex '.' excludes line terminators,
# which broke the class partition until the (?s) fix (review finding, r4)
name = st.text(alphabet="abπ0\n", min_size=0, max_size=9)
corpus = st.lists(name, min_size=2, max_size=24)


def _oracle(rows, max_dist):
    def ham(x, y):
        if len(x) != len(y):
            return None
        return sum(a != b for a, b in zip(x, y))

    out = set()
    for (i, na), (j, nb) in itertools.combinations(rows, 2):
        d = ham(na, nb)
        if d is not None and d <= max_dist:
            out.add((i, j, d))
    return out


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(names=corpus, max_dist=st.integers(min_value=1, max_value=3))
def test_fuzzy_pairs_match_quadratic_oracle(spark, names, max_dist):
    rows = list(enumerate(names))
    df = spark.createDataFrame(rows, "id long, name string")
    got = {
        tuple(r)
        for r in fuzzy_hamming_pairs(df, "id", "name", max_dist=max_dist).collect()
    }
    assert got == _oracle(rows, max_dist)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(names=corpus, n_classes=st.integers(min_value=3, max_value=6))
def test_compound_bands_are_lossless(spark, names, n_classes):
    # any n_classes > max_dist must produce the same exact pair set
    rows = list(enumerate(names))
    df = spark.createDataFrame(rows, "id long, name string")
    got = {
        tuple(r)
        for r in fuzzy_hamming_pairs(
            df, "id", "name", max_dist=2, n_classes=n_classes
        ).collect()
    }
    assert got == _oracle(rows, 2)
