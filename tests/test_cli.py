"""Drive the CLI the way a reference user would — real subprocess, real
files — covering both pipelines, dry-run default, and execute."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, **kw):
    env = dict(os.environ, PYTHONPATH=REPO, SPARK_GRAFT_CPUS="4")
    return subprocess.run(
        [sys.executable, "-m", "py_datalake_move_files_spark", *args],
        capture_output=True,
        text=True,
        timeout=240,
        env=env,
        cwd=str(REPO),
        **kw,
    )


def _mk_lake(tmp_path):
    src = tmp_path / "raw"
    (src / "q").mkdir(parents=True)
    (src / "q" / "1.json").write_text('{"SalesCompanyId": 100}')
    (src / "q" / "2.json").write_text('{"SalesCompanyId": 999}')
    (src / "q" / "3.txt").write_text("not json")
    return src


def test_cli_archive_dry_run_then_execute(tmp_path):
    src = _mk_lake(tmp_path)
    dst = tmp_path / "archive"
    manifest = tmp_path / "m.csv"
    manifest.write_text(
        "QuoteId;unixtimestamp;filename\nA;1;q/1.json\nB;2;q/2.json\nC;3;q/gone.json\n"
    )
    base = [
        "archive",
        "--manifest", str(manifest),
        "--source", str(src),
        "--target", str(dst),
    ]
    dry = _run(base)
    assert dry.returncode == 0, dry.stderr[-2000:]
    assert "found: 2  not_found: 1" in dry.stdout
    assert "planned" in dry.stdout and not dst.exists()

    ex = _run([*base, "--execute"])
    assert ex.returncode == 0, ex.stderr[-2000:]
    assert (dst / "q" / "1.json").exists() and (dst / "q" / "2.json").exists()
    assert (src / "q" / "1.json").exists()  # archive copies, never deletes


def test_cli_move_with_json_filter(tmp_path):
    src = _mk_lake(tmp_path)
    dst = tmp_path / "moved"
    out = _run(
        [
            "move",
            "--source", str(src),
            "--target", str(dst),
            "--json-key", "SalesCompanyId",
            "--json-value", "100",
            "--execute",
        ]
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "to_move: 1  skipped: 2" in out.stdout
    assert "content mismatch" in out.stdout
    assert (dst / "q" / "1.json").exists()
    assert not (src / "q" / "1.json").exists()  # move deletes source
    assert (src / "q" / "2.json").exists()  # mismatched file untouched


def test_cli_vacuum_and_compact(tmp_path):
    import time as _time

    lake = tmp_path / "lake"
    lake.mkdir()
    (lake / "old.txt").write_text("old")
    (lake / "new.txt").write_text("new")
    past = _time.time() - 90 * 86400
    os.utime(lake / "old.txt", (past, past))

    dry = _run(["vacuum", "--source", str(lake), "--older-than-days", "30"])
    assert dry.returncode == 0, dry.stderr[-2000:]
    assert "to_delete: 1" in dry.stdout and (lake / "old.txt").exists()

    ex = _run(["vacuum", "--source", str(lake), "--older-than-days", "30", "--execute"])
    assert ex.returncode == 0, ex.stderr[-2000:]
    assert not (lake / "old.txt").exists() and (lake / "new.txt").exists()


def test_cli_audit_clean_and_gate_mode(tmp_path):
    """audit prints the per-rule report; --fail-on-violations is the
    admission gate (exit 2 on any violation — clean test data exits 0)."""
    r = _run(["audit", "--sf-dir", "/root/testdata/sf0.001"])
    assert r.returncode == 0, r.stderr
    assert "orders_orphan_custkey: 0/" in r.stdout
    assert "documents_empty_text: 0/" in r.stdout
    assert r.stdout.count(":") >= 9

    r2 = _run(
        ["audit", "--sf-dir", "/root/testdata/sf0.001", "--fail-on-violations"]
    )
    assert r2.returncode == 0  # clean data passes the gate


def test_cli_audit_gate_fails_on_dirty_drop(spark, tmp_path):
    from pyspark.sql import functions as F

    from py_datalake_move_files_spark.catalog import load_table

    sf = "/root/testdata/sf0.001"
    d = tmp_path / "dirty"
    d.mkdir()
    for t in ("orders", "customer", "lineitem", "events"):
        load_table(spark, sf, t).write.parquet(str(d / f"{t}.parquet"))
    docs = load_table(spark, sf, "documents")
    docs.unionAll(docs.limit(2).withColumn("text", F.lit(""))).write.parquet(
        str(d / "documents.parquet")
    )

    r = _run(["audit", "--sf-dir", str(d), "--fail-on-violations"])
    assert r.returncode == 2
    assert "documents_empty_text: 2/" in r.stdout
    assert "FAIL: 2 violation(s)" in r.stderr


def test_cli_optimize_zorder(spark, tmp_path):
    """`optimize` rewrites a table z-order-clustered; row set survives."""
    from py_datalake_move_files_spark.catalog import load_table

    orders = load_table(spark, "/root/testdata/sf0.001", "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    src = tmp_path / "src"
    orders.repartition(4).write.parquet(str(src))

    out = tmp_path / "opt"
    r = _run(
        [
            "optimize",
            "--source",
            str(src),
            "--target",
            str(out),
            "--by",
            "o_totalprice,o_custkey",
            "--target-file-mb",
            "128",
        ]
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "z-ordered file(s)" in r.stdout
    back = spark.read.parquet(str(out))
    assert back.count() == orders.count()


def test_cli_sql_query_and_parquet_output(spark, tmp_path):
    """The ad-hoc SQL surface: a join over the registered lake views
    prints bounded rows, and --output writes the FULL result as parquet
    (the distributed path — verified by reading it back)."""
    r = _run(
        [
            "sql",
            "--sf-dir",
            "/root/testdata/sf0.001",
            "--query",
            "SELECT r_name, count(*) AS n FROM nation"
            " JOIN region ON n_regionkey = r_regionkey"
            " GROUP BY r_name ORDER BY r_name",
            "--limit",
            "3",
        ]
    )
    assert r.returncode == 0, r.stderr
    assert "r_name" in r.stdout

    out = tmp_path / "sqlout"
    r2 = _run(
        [
            "sql",
            "--sf-dir",
            "/root/testdata/sf0.001",
            "--query",
            "SELECT o_orderpriority, count(*) AS n FROM orders"
            " GROUP BY o_orderpriority",
            "--output",
            str(out),
        ]
    )
    assert r2.returncode == 0, r2.stderr
    back = spark.read.parquet(str(out))
    assert back.count() == 5
    assert set(back.columns) == {"o_orderpriority", "n"}


def test_cli_sql_bad_statement_fails_cleanly(tmp_path):
    r = _run(
        [
            "sql",
            "--sf-dir",
            "/root/testdata/sf0.001",
            "--query",
            "SELECT definitely_not_a_column FROM nation",
        ]
    )
    assert r.returncode != 0
    assert "error:" in r.stderr  # one clean line, not a JVM traceback


def test_cli_dedup_exact_and_near(tmp_path):
    """The dedup subcommand surfaces the curation-tier registry queries:
    exact mode prints, minhash mode writes parquet, and --output refuses
    to clobber without --overwrite."""
    out = tmp_path / "pairs"
    r = _run(
        ["dedup", "--sf-dir", "/root/testdata/sf0.001",
         "--mode", "exact", "--limit", "3"]
    )
    assert r.returncode == 0, r.stderr[-500:]
    assert "+" in r.stdout  # a rendered table

    r = _run(
        ["dedup", "--sf-dir", "/root/testdata/sf0.001",
         "--mode", "minhash", "--output", str(out)]
    )
    assert r.returncode == 0, r.stderr[-500:]
    assert out.exists()

    r = _run(
        ["dedup", "--sf-dir", "/root/testdata/sf0.001",
         "--mode", "minhash", "--output", str(out)]
    )
    assert r.returncode == 1  # errorifexists without --overwrite


def test_cli_profile_exact_approx_and_bad_column(tmp_path):
    """The profile subcommand surfaces profile_table: exact and --approx
    modes agree on rows/nulls/min/max (only distincts may differ), an
    unknown column fails fast with the available names, and --output
    writes parquet."""
    r = _run(
        ["profile", "--sf-dir", "/root/testdata/sf0.001",
         "--table", "orders", "--columns", "o_orderstatus,o_totalprice"]
    )
    assert r.returncode == 0, r.stderr[-500:]
    assert "o_orderstatus:" in r.stdout and "o_totalprice:" in r.stdout
    assert "exact distincts" in r.stdout

    r2 = _run(
        ["profile", "--sf-dir", "/root/testdata/sf0.001",
         "--table", "orders", "--columns", "o_orderstatus,o_totalprice",
         "--approx"]
    )
    assert r2.returncode == 0, r2.stderr[-500:]
    assert "approx (HLL" in r2.stdout

    def fields(out, col):
        line = next(l for l in out.splitlines() if l.strip().startswith(col))
        return {
            kv.split("=")[0]: kv.split("=", 1)[1]
            for kv in line.split(": ", 1)[1].split(" ")
        }

    for col in ["o_orderstatus", "o_totalprice"]:
        ex, ap = fields(r.stdout, col), fields(r2.stdout, col)
        for k in ["rows", "nulls", "min", "max"]:
            assert ex[k] == ap[k], (col, k, ex, ap)

    r3 = _run(
        ["profile", "--sf-dir", "/root/testdata/sf0.001",
         "--table", "orders", "--columns", "nope"]
    )
    assert r3.returncode == 2
    assert "unknown column(s)" in r3.stderr and "o_orderkey" in r3.stderr

    out = tmp_path / "prof"
    r4 = _run(
        ["profile", "--sf-dir", "/root/testdata/sf0.001",
         "--table", "documents", "--output", str(out)]
    )
    assert r4.returncode == 0, r4.stderr[-500:]
    assert out.exists()


def test_cli_selftest_passes_and_catches_unknown(tmp_path):
    """The selftest subcommand is the oracle-parity gate as a product
    surface: named queries pass against the bundled DuckDB oracles, and
    unknown names fail fast."""
    r = _run(
        ["selftest", "--sf-dir", "/root/testdata/sf0.001",
         "--query", "manifest_status_counts,dedup_exact,q1_pricing_summary"]
    )
    assert r.returncode == 0, r.stdout[-500:] + r.stderr[-500:]
    assert "selftest: 3/3 passed" in r.stdout

    r2 = _run(
        ["selftest", "--sf-dir", "/root/testdata/sf0.001", "--query", "nope"]
    )
    assert r2.returncode == 2
    assert "unknown query name(s)" in r2.stderr


def test_cli_card_prints_and_writes(tmp_path):
    """The dataset-card subcommand prints every section and lands parquet."""
    r = _run(["card", "--sf-dir", "/root/testdata/sf0.001"])
    assert r.returncode == 0, r.stdout[-500:] + r.stderr[-500:]
    for section in ("[documents]", "[events]", "[orders]", "[embeddings]"):
        assert section in r.stdout
    assert "n_rows = " in r.stdout

    out = tmp_path / "card"
    r2 = _run(
        ["card", "--sf-dir", "/root/testdata/sf0.001", "--output", str(out)]
    )
    assert r2.returncode == 0, r2.stderr[-500:]
    assert out.exists()


def test_cli_card_diff_detects_and_clears_drift(tmp_path):
    """--diff-against: identical snapshot exits 0 and says unchanged;
    a different SF (more rows everywhere) exits 1 and names the moved
    metrics with before -> after values."""
    base = tmp_path / "card_base"
    r0 = _run(
        ["card", "--sf-dir", "/root/testdata/sf0.001", "--output", str(base)]
    )
    assert r0.returncode == 0, r0.stderr[-500:]

    same = _run(
        ["card", "--sf-dir", "/root/testdata/sf0.001",
         "--diff-against", str(base)]
    )
    assert same.returncode == 0, same.stdout[-500:] + same.stderr[-500:]
    assert "card unchanged" in same.stdout

    drift = _run(
        ["card", "--sf-dir", "/root/testdata/sf0.01",
         "--diff-against", str(base)]
    )
    assert drift.returncode == 1, drift.stdout[-500:] + drift.stderr[-500:]
    assert "card drift" in drift.stdout
    # documents is 500 rows at BOTH small SFs (generator floor); orders scales
    assert "orders.n_rows: 1500 -> 15000" in drift.stdout


def test_cli_schema_diff_identical_and_drifted(tmp_path):
    """schema-diff: identical snapshots exit 0; a snapshot with a dropped
    column, a type change and an extra table exits 1 naming each drift."""
    r0 = _run(
        ["schema-diff", "--sf-dir", "/root/testdata/sf0.001",
         "--against", "/root/testdata/sf0.001"]
    )
    assert r0.returncode == 0, r0.stdout[-500:] + r0.stderr[-500:]
    assert "schemas identical" in r0.stdout

    # craft a drifted snapshot: documents loses `source`, n_chars becomes
    # int, and a new table appears
    import duckdb

    prev = tmp_path / "prev"
    prev.mkdir()
    con = duckdb.connect()
    con.execute(
        "COPY (SELECT doc_id, text, lang,"
        " CAST(n_chars AS INTEGER) AS n_chars"
        " FROM read_parquet('/root/testdata/sf0.001/documents.parquet'))"
        f" TO '{prev}/documents.parquet' (FORMAT parquet)"
    )
    con.execute(
        "COPY (SELECT 1 AS x)"
        f" TO '{prev}/extra.parquet' (FORMAT parquet)"
    )
    r1 = _run(
        ["schema-diff", "--sf-dir", str(prev),
         "--against", "/root/testdata/sf0.001"]
    )
    assert r1.returncode == 1, r1.stdout[-800:] + r1.stderr[-500:]
    assert "added table: extra" in r1.stdout
    assert "documents: removed column source (string)" in r1.stdout
    assert "documents: column n_chars type bigint -> int" in r1.stdout
    # the other nine tables count as removed (absent from the new snapshot)
    assert "removed table: events" in r1.stdout


def test_cli_selftest_rejects_nonpositive_max_queries():
    """--max-queries 0 used to silently run the FULL registry (falsy check,
    ADVICE r9); now the parser rejects anything below 1."""
    for bad in ("0", "-3"):
        r = _run(
            ["selftest", "--sf-dir", "/root/testdata/sf0.001",
             "--max-queries", bad]
        )
        assert r.returncode == 2, f"--max-queries {bad} was accepted"
        assert "must be >= 1" in r.stderr


def test_cli_selftest_max_queries_bounds_the_run():
    r = _run(
        ["selftest", "--sf-dir", "/root/testdata/sf0.001",
         "--query", "manifest_status_counts,dedup_exact,q1_pricing_summary",
         "--max-queries", "2"]
    )
    assert r.returncode == 0, r.stdout[-500:] + r.stderr[-500:]
    assert "selftest: 2/2 passed" in r.stdout


def test_cli_schema_diff_nested_types_and_exit_codes(tmp_path):
    """VERDICT r10 #8: the detection matrix must cover NESTED drift —
    array element type, map value type, struct field type change, and
    struct field reorder — and the exit-code contract is 0 identical /
    1 drift / 2 missing-directory usage error."""
    import duckdb

    con = duckdb.connect()
    base = tmp_path / "base"
    drift = tmp_path / "drift"
    base.mkdir()
    drift.mkdir()
    con.execute(
        "COPY (SELECT [1, 2]::INTEGER[] AS arr,"
        " MAP(['k'], [1])::MAP(VARCHAR, INTEGER) AS m,"
        " {'a': 1, 'b': 'x'} AS st)"
        f" TO '{base}/t.parquet' (FORMAT parquet)"
    )
    # identical copy -> exit 0
    con.execute(
        f"COPY (SELECT * FROM read_parquet('{base}/t.parquet'))"
        f" TO '{drift}/t.parquet' (FORMAT parquet)"
    )
    r0 = _run(["schema-diff", "--sf-dir", str(drift), "--against", str(base)])
    assert r0.returncode == 0, r0.stdout[-500:] + r0.stderr[-500:]
    assert "schemas identical" in r0.stdout

    # nested drift: array element widens, map value becomes VARCHAR,
    # struct field a changes type AND fields reorder -> exit 1, each named
    con.execute(
        "COPY (SELECT [1, 2]::BIGINT[] AS arr,"
        " MAP(['k'], ['1'])::MAP(VARCHAR, VARCHAR) AS m,"
        " {'b': 'x', 'a': 1.5} AS st)"
        f" TO '{drift}/t.parquet' (FORMAT parquet, OVERWRITE_OR_IGNORE)"
    )
    r1 = _run(["schema-diff", "--sf-dir", str(drift), "--against", str(base)])
    assert r1.returncode == 1, r1.stdout[-800:] + r1.stderr[-500:]
    assert "t: column arr type array<int> -> array<bigint>" in r1.stdout
    assert "t: column m type map<string,int> -> map<string,string>" in r1.stdout
    # struct change covers both the field-type change and the reorder
    assert (
        "t: column st type struct<a:int,b:string> ->"
        " struct<b:string,a:decimal(2,1)>" in r1.stdout
    )

    # pure struct-field REORDER (same fields, same types) is drift too
    reorder = tmp_path / "reorder"
    reorder.mkdir()
    con.execute(
        "COPY (SELECT [1, 2]::INTEGER[] AS arr,"
        " MAP(['k'], [1])::MAP(VARCHAR, INTEGER) AS m,"
        " {'b': 'x', 'a': 1} AS st)"
        f" TO '{reorder}/t.parquet' (FORMAT parquet)"
    )
    r2 = _run(["schema-diff", "--sf-dir", str(reorder), "--against", str(base)])
    assert r2.returncode == 1, r2.stdout[-800:] + r2.stderr[-500:]
    assert (
        "t: column st type struct<a:int,b:string> ->"
        " struct<b:string,a:int>" in r2.stdout
    )

    # missing directory is a usage error (2), never an "empty lake" (1)
    r3 = _run(
        ["schema-diff", "--sf-dir", str(base),
         "--against", str(tmp_path / "nope")]
    )
    assert r3.returncode == 2, r3.stdout[-500:] + r3.stderr[-500:]
    assert "not a directory" in r3.stderr
