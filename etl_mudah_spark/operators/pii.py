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
