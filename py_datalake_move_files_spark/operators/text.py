"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All pure Column expressions (JVM-side, codegen). Each has an exact DuckDB
oracle (queries.py) — the heuristics are deliberately deterministic:
marker-token scoring for language, arithmetic ratios for quality, md5-min
shingle fingerprints (a simplified winnowing) for near-dup sketching.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Marker tokens per language for the n-gram/stopword language-ID heuristic.
#: Real pipelines use character n-gram profiles (e.g. CLD-style); the harness
#: corpus is synthetic-English so markers demonstrate the mechanism.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "la", "los", "y", "es"),
}

STOPWORDS: tuple[str, ...] = ("the", "a", "of", "and", "to", "in", "is", "on")

#: BPE-ish pre-tokenizer: letter runs, digit runs, single other non-space —
#: a regex sketch of GPT-2-style pretokenization.
BPE_ISH_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


_UNIQ = iter(range(10**9))


def marker_hits(text_sql: str, words: tuple[str, ...]) -> Column:
    """Count of whitespace tokens that are in ``words``.

    Built as SQL text with a unique lambda variable — multiple python-lambda
    HOFs in one projection corrupt silently (tests/test_lambda_safety.py).
    """
    u = next(_UNIQ)
    inlist = ", ".join(f"'{w}'" for w in words)
    return F.expr(
        f"size(filter(split({text_sql}, ' '), t{u} -> t{u} IN ({inlist})))"
    )


def lang_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-language marker-hit ratios, plus the argmax prediction
    (ties broken by language code order, 'unknown' when all scores are 0)."""
    n = F.size(F.split(F.col(text_col), " "))
    out = df
    langs = sorted(LANG_MARKERS)
    for lang in langs:
        out = out.withColumn(
            f"score_{lang}", F.round(marker_hits(text_col, LANG_MARKERS[lang]) / n, 6)
        )
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = F.when(best.isNull() | (best == 0), F.lit("unknown"))
    for lang in langs:  # alphabetical priority breaks score ties
        pred = pred.when(F.col(f"score_{lang}") == best, F.lit(lang))
    return out.withColumn("pred_lang", pred)


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens and BPE-ish regex tokens."""
    t = F.col(text_col)
    return df.withColumn("n_ws_tokens", F.size(F.split(t, " "))).withColumn(
        "n_bpe_tokens", F.size(F.regexp_extract_all(t, F.lit(BPE_ISH_PATTERN), 0))
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality heuristics: length, mean token length, stopword ratio,
    punctuation ratio, and a composite [0,1] score.

    Composite = 0.4·min(n_tokens/100, 1) + 0.3·stopword_ratio·4 (capped at
    0.3) + 0.3·(1 − punct_ratio) — a toy version of Gopher/C4-style filters,
    fully deterministic and oracle-checkable.
    """
    t = F.col(text_col)
    toks = F.split(t, " ")
    n = F.size(toks)
    stop_ratio = marker_hits(text_col, STOPWORDS) / n
    punct_ratio = F.size(F.regexp_extract_all(t, F.lit("[^a-zA-Z0-9 ]"), 0)) / F.length(t)
    return (
        df.withColumn("n_tokens", n)
        .withColumn("mean_tok_len", F.round((F.length(t) - (n - 1)) / n, 6))
        .withColumn("stopword_ratio", F.round(stop_ratio, 6))
        .withColumn("punct_ratio", F.round(punct_ratio, 6))
        .withColumn(
            "quality",
            F.round(
                0.4 * F.least(n / F.lit(100.0), F.lit(1.0))
                + F.least(0.3 * stop_ratio * 4, F.lit(0.3))
                + 0.3 * (1 - punct_ratio),
                6,
            ),
        )
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str = "text", *, k: int = 5) -> DataFrame:
    """Document fingerprint: lexicographic min of md5 over the doc's k-word
    shingles — a one-permutation MinHash / simplified winnowing selection of
    a representative rolling window. Equal fingerprints ⇒ candidate dups."""
    from py_datalake_move_files_spark.functions.scaling import ensure_parallelism
    from py_datalake_move_files_spark.operators.dedup import with_shingles

    sh = with_shingles(ensure_parallelism(df), text_col, k)
    u = next(_UNIQ)
    return sh.select(
        F.col(id_col),
        F.expr(f"array_min(transform(shingle_set, f{u} -> md5(f{u})))").alias(
            "fingerprint"
        ),
    )


def normalize(df: DataFrame, text_col: str = "text", out: str = "text_norm") -> DataFrame:
    """Training-corpus text normalization: lowercase, strip non-alphanumeric
    (keeping spaces), collapse whitespace runs, trim. Pure column exprs."""
    t = F.lower(F.col(text_col))
    t = F.regexp_replace(t, "[^a-z0-9 ]", " ")
    t = F.trim(F.regexp_replace(t, " +", " "))
    return df.withColumn(out, t)


def dataset_split(
    df: DataFrame,
    id_col: str,
    *,
    weights: dict[str, int] | None = None,
    out: str = "split",
) -> DataFrame:
    """Deterministic, reproducible train/val/test assignment: the first two
    md5 hex digits of the id (0..255) are bucketed by cumulative weights.
    Stable across runs, engines, and partitionings — the property random
    ``sample()`` can't give a training pipeline."""
    from py_datalake_move_files_spark.operators.dedup import hex_value_sql

    w = weights or {"train": 90, "val": 5, "test": 5}
    total = sum(w.values())
    hv = hex_value_sql(f"md5(CAST({id_col} AS STRING))", 2)
    expr = None
    acc = 0
    for name, weight in w.items():
        acc += weight
        bound = 256 * acc // total
        cond = F.expr(f"({hv}) < {bound}")
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return df.withColumn(out, expr)
