"""Leaf module: portable DuckDB SQL fragment generators for the embedding
oracles plus the corpus dimensionality constant.

Deliberately dependency-free (no imports from the registry) so that shared
oracle preludes (``oracle_ivf``) can be built at import time from ANY entry
module without circular-import ordering constraints. ``queries`` re-exports
these names, so existing ``from queries import dd_cosine`` call sites are
unchanged.
"""

from __future__ import annotations

EMB_DIM = 64


def dd_dot(a: str, b: str, dim: int = EMB_DIM) -> str:
    """Left-associative explicit dot product — IEEE-identical to Spark's
    sequential ``aggregate`` fold."""
    return " + ".join(f"{a}[{i}]::DOUBLE * {b}[{i}]::DOUBLE" for i in range(1, dim + 1))


def dd_norm(a: str, dim: int = EMB_DIM) -> str:
    return "sqrt(" + " + ".join(f"{a}[{i}]::DOUBLE * {a}[{i}]::DOUBLE" for i in range(1, dim + 1)) + ")"


def dd_cosine(a: str, b: str, dim: int = EMB_DIM) -> str:
    return f"round(({dd_dot(a, b, dim)}) / (({dd_norm(a, dim)}) * ({dd_norm(b, dim)})), 6)"
