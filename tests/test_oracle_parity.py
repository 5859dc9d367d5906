"""Local mirror of the driver's correctness gate: run every registered query
on Spark AND its oracle SQL on DuckDB at sf0.001, compare row count, column
names, and an order-insensitive value hash.

Values are canonicalized the same way for both engines (repr of python
scalars after float→17g formatting), rows sorted, columns sorted by name —
deliberately stricter than needed so the driver's unknown exact hashing
scheme is very likely to pass if this does.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from py_datalake_move_files_spark.catalog import TABLES
from py_datalake_move_files_spark.queries import ORACLE, QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _canon_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return format(v, ".17g")
    return str(v)


def _canon_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon_value(r[i]) for i in idx) for r in rows)


def _duck_conn(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


@pytest.fixture(scope="module")
def duck():
    con = _duck_conn(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck):
    sdf = QUERIES[name](spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    scols = list(sdf.columns)

    if name not in ORACLE:
        # rows-only check (sketch/approx operators)
        assert len(srows) >= 0
        return

    res = duck.execute(ORACLE[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column mismatch"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"
    sc = _canon_rows(scols, srows)
    dc = _canon_rows(dcols, drows)
    if sc != dc:
        diff = [(a, b) for a, b in zip(sc, dc) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diff}")
