"""Text-analysis operators for training-data pipelines.

All pure Column expressions (JVM-side, whole-stage codegen) — no Python
UDFs anywhere on the hot path, so these run at full scan speed on a
100 TB corpus. Each operator is a ``DataFrame -> DataFrame`` transform
over a text column.

Operators:
- tokenize / token_count     — whitespace + BPE-ish regex token splits
- quality_features           — length / punctuation / stopword / TTR scores
- lang_id                    — n-gram/stopword-overlap language heuristic
- fingerprint                — md5 content fingerprint + rolling-hash shingle
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WHITESPACE_RE = r"\s+"
# BPE-ish pre-tokenizer: words, numbers, or single non-space symbols
# (the GPT-2 pre-tokenizer family, simplified to RE2-safe syntax).
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# Tiny per-language stopword lists for the heuristic lang-id.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein"],
    "fr": ["le", "la", "les", "et", "est", "un", "une"],
    "es": ["el", "la", "los", "y", "es", "un", "una"],
}


def words(col: Column | str) -> Column:
    """Whitespace tokenization to an array column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), WHITESPACE_RE)


def token_count(col: Column | str) -> Column:
    """Whitespace token count.

    Kept as ``size(split(...))`` DELIBERATELY: the allocation-free
    ``regexp_count(trim(c), '\\s+') + 1`` twin (provably equal on every
    non-null string — split(limit=-1) keeps empty pieces, so pieces ==
    separator matches + 1) was A/B'd on the x100 1.09 GB documents
    staging in round 14 and measured NO faster (min 4.12 vs 4.21 s,
    medians 4.51 vs 4.99 — the zstd scan + regex matching dominate and
    Java's split-token allocation is noise); see OPTIMIZATION_r14.md.
    The equality itself stays pinned in tests/test_optimization_r14.py
    so a future re-attempt starts from the proof, not the derivation.
    """
    return F.size(words(col))


def bpe_token_count(col: Column | str) -> Column:
    """Token count under the BPE-ish regex pre-tokenizer."""
    c = F.col(col) if isinstance(col, str) else col
    # regexp_count is Spark 3.5+; counts non-overlapping matches.
    return F.regexp_count(c, F.lit(BPE_TOKEN_RE))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append quality-scoring features used by corpus filters:

    n_chars_m (measured), n_tokens, avg_token_len, punct_ratio,
    digit_ratio, type_token_ratio (lexical diversity), stopword_ratio.
    """
    w = words(text_col)
    n_tok = F.size(w)
    n_chars = F.length(F.col(text_col))
    en = F.array([F.lit(s) for s in STOPWORDS["en"]])
    stop_hits = F.size(F.filter(w, lambda x: F.array_contains(en, F.lower(x))))
    # All ratios are int/int divisions — exact, IEEE-deterministic, and
    # deliberately UNROUNDED (cross-engine round() disagrees at decimal
    # boundaries; see functions/core.py).
    return (
        df.withColumn("n_chars_m", n_chars)
        .withColumn("n_tokens", n_tok)
        .withColumn("avg_token_len", (n_chars - (n_tok - 1)) / n_tok)
        .withColumn(
            "punct_ratio",
            F.length(F.regexp_replace(F.col(text_col), r"[A-Za-z0-9\s]", "")) / n_chars,
        )
        .withColumn(
            "digit_ratio",
            F.length(F.regexp_replace(F.col(text_col), r"[^0-9]", "")) / n_chars,
        )
        .withColumn("type_token_ratio", F.size(F.array_distinct(w)) / n_tok)
        .withColumn("stopword_ratio", stop_hits / n_tok)
    )


def lang_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_guess") -> DataFrame:
    """Heuristic language ID: argmax of stopword-overlap scores.

    Deterministic tie-break: score ties resolve to the lexicographically
    LARGEST language code (array_max over (score, code) structs compares
    fields in order, so equal scores fall through to the code). The
    DuckDB oracle in plans/datapipe.py encodes the same tie order. At
    scale this is a single codegen'd projection — no shuffle, no UDF.
    """
    w = words(text_col)
    n_tok = F.size(w)
    scores = []
    for code, stops in sorted(STOPWORDS.items()):
        arr = F.array([F.lit(s) for s in stops])
        score = F.size(F.filter(w, lambda x: F.array_contains(arr, F.lower(x)))) / n_tok
        scores.append(F.struct(score.alias("score"), F.lit(code).alias("code")))
    best = F.array_max(F.array(*scores))
    guessed = F.when(best["score"] >= 0.05, best["code"]).otherwise(F.lit("unknown"))
    return df.withColumn(out_col, guessed)


def fingerprint(df: DataFrame, text_col: str = "text", out_col: str = "fingerprint") -> DataFrame:
    """Content fingerprint: md5 of normalized text (lower + trim +
    whitespace-collapse). Identical normalization in the DuckDB oracle."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), WHITESPACE_RE, " ")
    return df.withColumn(out_col, F.md5(norm))
