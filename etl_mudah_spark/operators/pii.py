"""PII scrubbing for training-data pipelines: detect and redact
emails, phone numbers, and IPv4 addresses in a text column.

Pure Column expressions (regexp_count / regexp_replace) — JVM-side,
whole-stage codegen, zero shuffle: at 100 TB this runs at scan speed
exactly like the quality/repetition scorers.

Pattern discipline: every regex here is deliberately restricted to the
syntax subset that Java regex (Spark) and RE2 (DuckDB, the oracle
engine) interpret identically — character classes, bounded repetition,
alternation, ``\\b`` word boundaries; no backreferences, no lookaround.
That keeps the DuckDB oracle exact, and it is also the subset that
stays linear-time at scan scale.

Redaction order matters: emails first (they contain dots and digits),
then IPv4 (dotted digit runs), then phones (the phone class has no
dots, so it cannot span an already-redacted IP or cross a dot).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
# >=9 phone-ish chars bounded by digits; allows +country, (area), -, space.
PHONE_RE = r"\+?[0-9][0-9()\- ]{7,}[0-9]"

_PATTERNS = (("email", EMAIL_RE), ("ip", IPV4_RE), ("phone", PHONE_RE))


def pii_counts(text: Column | str) -> dict[str, Column]:
    """``{kind: count}`` of PII matches in ``text`` (non-overlapping)."""
    c = F.col(text) if isinstance(text, str) else text
    return {kind: F.regexp_count(c, F.lit(pat)) for kind, pat in _PATTERNS}


def scrub(text: Column | str) -> Column:
    """Redact PII in order (email -> ip -> phone) with ``<KIND>`` tokens."""
    c = F.col(text) if isinstance(text, str) else text
    for kind, pat in _PATTERNS:
        c = F.regexp_replace(c, pat, f"<{kind.upper()}>")
    return c


def pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append ``n_emails/n_ips/n_phones`` counts and a ``text_scrubbed``
    column with all three redacted."""
    counts = pii_counts(text_col)
    return (
        df.withColumn("n_emails", counts["email"])
        .withColumn("n_ips", counts["ip"])
        .withColumn("n_phones", counts["phone"])
        .withColumn("text_scrubbed", scrub(text_col))
    )


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    k: int,
) -> DataFrame:
    """1-row privacy audit before a data release: ``(k, n_rows,
    n_classes, min_class_size, classes_below_k, rows_below_k,
    pct_below_k, min_l_diversity)``.

    A release is k-anonymous when every quasi-identifier equivalence
    class (rows sharing all ``quasi_cols`` values) has at least k
    members — ``rows_below_k`` counts exactly the rows a suppression
    pass would have to drop or generalize. ``min_l_diversity`` is the
    companion check: the smallest number of DISTINCT ``sensitive_col``
    values inside any class (k-anonymity without l-diversity still
    leaks when a whole class shares one sensitive value). NULL counts
    as a regular value in both roles.

    Scale shape (100 TB): one (quasi-cols) hash aggregation with
    map-side partials reduces the corpus to its equivalence classes
    (count + distinct-sensitive per class — the distinct rides a
    two-level exact aggregation), then a 1-row reduction. No window,
    no join, no collect.

    Reference analog: none — the reference publishes scraped listings
    as-is; this is the gate a curated release runs first (it
    complements the PII scrubbing above and the erasure audit in
    plans/parity.py: scrub text, THEN check the schema itself does
    not re-identify).
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    classes = df.groupBy(*quasi_cols).agg(
        F.count("*").cast("bigint").alias("_sz"),
        # SQL COUNT(DISTINCT) drops NULLs; coalesce to a sentinel so a
        # NULL sensitive value still counts as one distinct value
        # (mirror the same coalesce in oracle twins; a real "<null>"
        # string would merge with it — acceptable and documented).
        F.countDistinct(
            F.coalesce(F.col(sensitive_col).cast("string"), F.lit("<null>"))
        )
        .cast("bigint")
        .alias("_l"),
    )
    return classes.agg(
        F.sum("_sz").cast("bigint").alias("n_rows"),
        F.count("*").cast("bigint").alias("n_classes"),
        F.min("_sz").alias("min_class_size"),
        F.sum(F.when(F.col("_sz") < k, 1).otherwise(0))
        .cast("bigint")
        .alias("classes_below_k"),
        F.sum(F.when(F.col("_sz") < k, F.col("_sz")).otherwise(0))
        .cast("bigint")
        .alias("rows_below_k"),
        F.min("_l").alias("min_l_diversity"),
    ).select(
        F.lit(k).alias("k"),
        "n_rows",
        "n_classes",
        "min_class_size",
        "classes_below_k",
        "rows_below_k",
        (F.col("rows_below_k") * 100.0 / F.col("n_rows")).alias(
            "pct_below_k"
        ),
        "min_l_diversity",
    )
