"""Import-order robustness: every query module must be importable FIRST
(before the registry root) from a clean interpreter. Guards the circular
chain queries_ivf -> queries -> queries_pq -> (IVF oracle prelude) that
once broke any direct `import queries_ivf`."""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

import pytest

REPO = str(Path(__file__).resolve().parents[1])

MODULES = [
    "queries",
    "queries_analytics",
    "queries_profiling",
    "queries_corpus",
    "queries_ivf",
    "queries_pq",
    "queries_tpch",
    "queries_scale",
    "queries_retrieval",
    "queries_knn",
    "queries_insights",
    "queries_stats",
    "queries_mining",
    "queries_pipeline",
    "queries_eval",
    "oracle_ivf",
]


@pytest.mark.parametrize("mod", MODULES)
def test_module_imports_first(mod):
    code = (
        f"import sys; sys.path.insert(0, {REPO!r}); "
        f"import py_datalake_move_files_spark.{mod}; "
        "from py_datalake_move_files_spark.queries import QUERIES, ORACLE; "
        "assert len(QUERIES) == len(ORACLE) >= 148, len(QUERIES)"
    )
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=120
    )
    assert r.returncode == 0, f"{mod}: {r.stderr[-800:]}"
