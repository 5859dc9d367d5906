"""Path-transform expressions (SURVEY.md §2.2 P4-P8).

All pure Column expressions — JVM-side, codegen-friendly, no UDFs. Each
mirrors a reference behavior (cited) with one documented divergence: prefix
rewrite is ANCHORED by default (the reference's ``str.replace(src, tgt, 1)``
at app/app.py:45 replaces the first occurrence *anywhere*; anchored prefix
semantics is what the surrounding code intends — SURVEY.md §7.3.3). The
faithful replace-first behavior is available via
``rewrite_prefix(..., compat_replace_first=True)`` for migrating manifests
produced by the reference.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_slashes(path: Column) -> Column:
    """Collapse ``//`` runs to ``/`` (reference app/main.py:159)."""
    return F.regexp_replace(path, "/{2,}", "/")


def basename(path: Column) -> Column:
    """Last path segment (reference ``split('/')[-1]``, app/app.py:51)."""
    return F.element_at(F.split(path, "/"), -1)


def parent_dir(path: Column) -> Column:
    """Everything before the last ``/``; '' when no slash; NULL propagates
    (reference ``'/'.join(target.split('/')[:-1])``, app/main.py:168 —
    the old otherwise('') branch swallowed NULL paths because a NULL
    when-condition falls through to otherwise; degenerate-lake rule)."""
    return F.when(path.isNull(), F.lit(None).cast("string")).when(
        F.instr(path, "/") > 0,
        path.substr(F.lit(1), F.length(path) - F.length(basename(path)) - 1),
    ).otherwise(F.lit(""))


def prefix_qualify(filename: Column, source_prefix: str) -> Column:
    """P4 (reference app/app.py:104-111): if ``filename`` already starts with
    the source prefix keep it, else prepend ``source_prefix.rstrip('/') + '/'``.
    """
    pref = source_prefix.rstrip("/") + "/"
    return F.when(filename.startswith(source_prefix), filename).otherwise(
        F.concat(F.lit(pref), filename)
    )


def strip_leading(path: Column, n_chars: int) -> Column:
    """Drop the first ``n_chars`` characters."""
    return path.substr(F.lit(n_chars + 1), F.length(path))


def rewrite_prefix(
    path: Column,
    source_prefix: str,
    target_prefix: str,
    *,
    compat_replace_first: bool = False,
) -> Column:
    """P5 (reference app/app.py:45-53), anchored by default: if ``path``
    starts with ``source_prefix`` swap it for ``target_prefix``; otherwise
    fall back to ``target_prefix + basename(path)`` exactly as the reference
    does when its replace was a no-op (app/app.py:49-53).

    ``compat_replace_first=True`` reproduces the reference's literal
    ``str.replace(source_prefix, target_prefix, 1)`` semantics instead:
    the FIRST occurrence of ``source_prefix`` *anywhere* in the path is
    replaced (no slash normalization), and only when the replace changed
    nothing does the basename fallback apply — so a prefix string recurring
    mid-path (``staging/lake/raw/…`` with source ``lake/raw``) rewrites
    mid-path under compat but takes the fallback under anchored semantics.
    Use compat when migrating manifests whose targets were produced by the
    reference; anchored is what the surrounding code intends (SURVEY §7.3.3).
    """
    if compat_replace_first:
        pos = F.instr(path, source_prefix)
        replaced = F.when(
            pos > 0,
            F.concat(
                path.substr(F.lit(1), pos - 1),
                F.lit(target_prefix),
                path.substr(pos + len(source_prefix), F.length(path)),
            ),
        ).otherwise(path)
        fallback = F.concat(F.lit(target_prefix.rstrip("/") + "/"), basename(path))
        return F.when(replaced == path, fallback).otherwise(replaced)
    tgt = target_prefix.rstrip("/") + "/"
    return normalize_slashes(
        F.when(
            path.startswith(source_prefix),
            F.concat(F.lit(tgt), strip_leading(path, len(source_prefix))),
        ).otherwise(F.concat(F.lit(tgt), basename(path)))
    )


def strip_prefix_rewrite(path: Column, source_path: str, target_path: str) -> Column:
    """P6 (reference app/main.py:152-159): strip ``source_path`` from the
    front, lstrip ``/``, join onto ``target_path`` with ``//``→``/``
    normalization. Paths not under ``source_path`` keep their basename only
    (the reference never hits that branch — its input is a listing of
    ``source_path``)."""
    rel = F.when(
        path.startswith(source_path),
        F.regexp_replace(strip_leading(path, len(source_path)), "^/+", ""),
    ).otherwise(basename(path))
    return normalize_slashes(F.concat(F.lit(target_path.rstrip("/") + "/"), rel))
