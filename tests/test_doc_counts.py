"""Doc-count drift guard (VERDICT r10 #7): round 10's README/PLANS drifted
through 296/297/298/299 as queries landed. The registry size may be
mentioned in prose ONLY as ``N-query registry``, and every such mention
must equal ``len(QUERIES)`` — so adding a query without updating the docs
(or vice versa) fails the suite instead of shipping a stale count."""

from __future__ import annotations

import re
from pathlib import Path

from py_datalake_move_files_spark.queries import ORACLE, QUERIES

ROOT = Path(__file__).resolve().parent.parent

_COUNT_RE = re.compile(r"(\d+)-query\s+registry")


def _mentions(path: Path) -> list[int]:
    return [int(m) for m in _COUNT_RE.findall(path.read_text())]


def test_readme_registry_count_matches_code():
    mentions = _mentions(ROOT / "README.md")
    assert mentions, "README must state the registry size as 'N-query registry'"
    assert all(m == len(QUERIES) for m in mentions), (
        f"README claims {mentions}, registry has {len(QUERIES)}"
    )


def test_plans_current_registry_count_matches_code():
    """PLANS.md is an append-style audit log whose BODY keeps historical
    per-round counts ('268-query registry' from the r8 sweep); only a
    mention marked ``current`` (e.g. 'current 299-query registry') is a
    live claim and must track the code."""
    text = (ROOT / "PLANS.md").read_text()
    live = [int(m) for m in re.findall(r"current (\d+)-query registry", text)]
    assert all(m == len(QUERIES) for m in live), (
        f"PLANS.md current-count claims {live}, registry has {len(QUERIES)}"
    )


def test_oracle_covers_registry():
    """Every registered query ships oracle SQL (the zero rows-only-escapes
    invariant the r10 verdict spot-checked by hand)."""
    assert set(ORACLE) == set(QUERIES)
