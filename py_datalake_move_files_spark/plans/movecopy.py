"""Plan-then-execute move/copy sink (SURVEY.md §2.1 S7-S10, §2.11 E1-E5).

The reference mutates the lake inside hand-rolled thread batches
(app/app.py:174-187 copy; app/main.py:278-303 download→upload→delete) and
reports via prints. Here mutation is split into:

1. a pure **plan DataFrame** ``(source_path, target_path, ...)`` — the
   dry-run, satisfying the reference's interactive-confirm gate
   (app/main.py:269-272) as an inspectable artifact instead of ``input()``;
2. :func:`execute_plan`, which runs the side effects distributed via
   ``mapInPandas`` (one task per partition replaces MAX_WORKERS threads;
   Spark's scheduler + AQE replace BATCH_SIZE/gc, app/app.py:33,174) and
   returns an **audit DataFrame** ``(source_path, target_path, action,
   status, reason)`` — the reference's success/failure tally
   (app/main.py:305-309) becomes ``audit.groupBy("status").count()``.

Move gates the source delete on a verified copy (the reference deletes
blindly after upload, app/main.py:184-185 — SURVEY.md §7.3.2). Copy is
idempotent: re-running a plan overwrites targets (upload ``overwrite=True``
semantics, app/main.py:179-182).

I/O here uses ``fsspec``-style local file ops through plain Python ``os`` /
``shutil`` so it runs anywhere tests run; against a real lake the same
partition function swaps in the Hadoop FileSystem / cloud SDK — the plan and
audit contracts don't change.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

AUDIT_SCHEMA = T.StructType(
    [
        T.StructField("source_path", T.StringType()),
        T.StructField("target_path", T.StringType()),
        T.StructField("action", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("reason", T.StringType()),
    ]
)


def execute_plan(
    plan: DataFrame,
    *,
    mode: str = "copy",
    overwrite: bool = True,
    dry_run: bool = False,
    source_col: str = "source_path",
    target_col: str = "target_path",
    parallelism: int | None = None,
) -> DataFrame:
    """Execute a move/copy plan; return the audit DataFrame.

    ``mode``: ``"copy"`` (S8), ``"move"`` (S7+S9 — delete gated on a
    verified copy: target must exist and match source size before the source
    is removed), or ``"delete"`` (retention/vacuum: removes the source;
    ``target_path`` is ignored and may be absent). ``dry_run=True`` returns
    the audit with status ``planned`` and touches nothing (E5).
    """
    if mode not in ("copy", "move", "delete"):
        raise ValueError(f"mode must be copy|move|delete, got {mode!r}")

    if mode == "delete" and target_col not in plan.columns:
        plan = plan.withColumn(target_col, F.lit(None).cast("string"))
    rows = plan.select(
        F.col(source_col).alias("source_path"),
        F.col(target_col).alias("target_path"),
    )
    if parallelism:
        rows = rows.repartition(parallelism)

    if dry_run:
        return rows.select(
            "source_path",
            "target_path",
            F.lit(mode).alias("action"),
            F.lit("planned").alias("status"),
            F.lit(None).cast("string").alias("reason"),
        )

    # Plans are usually derived from a live file listing (binaryFile) that
    # this very execution mutates. Two defenses:
    # 1. scans tolerate files deleted between listing and read (a re-executed
    #    stale plan sees the survivors instead of crashing);
    # 2. localCheckpoint materializes the (source, target) paths and cuts the
    #    lineage, so replaying the returned audit never re-scans.
    plan.sparkSession.conf.set("spark.sql.files.ignoreMissingFiles", "true")
    rows = rows.localCheckpoint(eager=True)

    do_move = mode == "move"
    do_delete = mode == "delete"

    def run_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # self-contained worker closure (stdlib imports + locals only) so it
        # deserializes on executors that cannot import this package
        import os as _os
        import shutil as _shutil

        import pandas as _pd

        def local(p: str) -> str:
            return p[5:] if p.startswith("file:") else p

        for batch in batches:
            out = []
            for src, dst in zip(batch["source_path"], batch["target_path"]):
                try:
                    if do_delete:
                        _os.remove(local(src))
                        out.append((src, dst, mode, "ok", None))
                        continue
                    if dst is None:
                        raise ValueError("no target path (source not found)")
                    lsrc, ldst = local(src), local(dst)
                    if not overwrite and _os.path.exists(ldst):
                        raise FileExistsError(ldst)
                    # mkdir-if-needed, ref app/main.py:167-172
                    _os.makedirs(_os.path.dirname(ldst) or ".", exist_ok=True)
                    _shutil.copyfile(lsrc, ldst)
                    if do_move:
                        # verified-write gate before delete (SURVEY §7.3.2)
                        if _os.path.getsize(ldst) != _os.path.getsize(lsrc):
                            raise OSError(f"size mismatch after copy: {dst}")
                        _os.remove(lsrc)
                    out.append((src, dst, mode, "ok", None))
                except Exception as exc:  # per-file error-as-status, ref app/main.py:190-192
                    out.append((src, dst, mode, "error", f"{type(exc).__name__}: {exc}"))
            yield _pd.DataFrame(
                out,
                columns=["source_path", "target_path", "action", "status", "reason"],
            )

    return rows.mapInPandas(run_partition, AUDIT_SCHEMA)


def audit_summary(audit: DataFrame) -> DataFrame:
    """A2/S10: success/failure totals as a DataFrame."""
    return audit.groupBy("action", "status").count().orderBy("action", "status")
