"""Cross-engine parity canon: the ONE canonical form both the local test
mirror (tests/test_oracle_parity.py) and the ``selftest`` CLI use to
compare a registered Spark query against its DuckDB oracle SQL.

Rows are compared order-insensitively with columns sorted by name and
every scalar rendered to a deterministic string (floats via %.17g — the
shortest round-trip-exact form, so two bit-identical doubles can never
canonicalize differently). This is deliberately STRICTER than a typical
result comparison: if this form matches, any reasonable exact hashing
scheme (the external driver's included) matches too.
"""

from __future__ import annotations

import math


def canon_value(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return format(v, ".17g")
    return str(v)


def canon_rows(cols, rows):
    """Order-insensitive canonical form: columns sorted by name, each row
    a tuple of canonical strings, rows sorted."""
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon_value(r[i]) for i in idx) for r in rows)


def duck_connection(sf_dir: str):
    """Fresh DuckDB connection with every lake table registered as a view
    (the external driver's oracle-side setup)."""
    import duckdb

    from py_datalake_move_files_spark.catalog import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def compare_query(spark, con, name: str, sf_dir: str) -> dict:
    """Run one registered query on Spark and its oracle on ``con``;
    return the driver-style verdict row (rows/schema/values match)."""
    from py_datalake_move_files_spark.queries import ORACLE, QUERIES

    df = QUERIES[name](spark, sf_dir)
    s_cols = list(df.columns)
    s_rows = [tuple(r) for r in df.collect()]
    sql = ORACLE.get(name)
    if sql is None:
        return {
            "name": name,
            "rows_match": None,
            "schema_match": None,
            "values_match": None,
            "spark_rows": len(s_rows),
            "oracle_rows": None,
            "note": "rows-only (no SQL-expressible oracle)",
        }
    cur = con.execute(sql)
    o_cols = [d[0] for d in cur.description]
    o_rows = cur.fetchall()
    return {
        "name": name,
        "rows_match": len(s_rows) == len(o_rows),
        "schema_match": sorted(s_cols) == sorted(o_cols),
        "values_match": canon_rows(s_cols, s_rows) == canon_rows(o_cols, o_rows),
        "spark_rows": len(s_rows),
        "oracle_rows": len(o_rows),
    }
