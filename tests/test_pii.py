"""PII scrubbing on planted data (the synthetic corpus is PII-free, so
the registered doc_pii_scrub query only proves all-zeros; real behavior
is pinned here)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_mudah_spark.operators.pii import pii_scrub

ROWS = [
    (0, "contact me at jane.doe+spam@example.co.uk for details"),
    (1, "server at 10.0.0.255 and backup at 192.168.1.1 are up"),
    (2, "call +60 12-345 6789 or (03) 9876 5432 now"),
    (3, "mixed: a@b.io, 8.8.8.8, and 012-3456789."),
    (4, "clean text with no personal data at all"),
    (5, "not an ip 999.999 nor a phone 123 nor mail a@b"),
]


def test_counts_and_redaction(spark):
    df = spark.createDataFrame(ROWS, "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in pii_scrub(df).collect()}

    assert (out[0]["n_emails"], out[0]["n_ips"], out[0]["n_phones"]) == (1, 0, 0)
    assert "<EMAIL>" in out[0]["text_scrubbed"]
    assert "jane.doe" not in out[0]["text_scrubbed"]

    assert out[1]["n_ips"] == 2
    assert out[1]["text_scrubbed"].count("<IP>") == 2

    assert out[2]["n_phones"] == 2
    assert out[2]["text_scrubbed"].count("<PHONE>") == 2

    r3 = out[3]
    assert (r3["n_emails"], r3["n_ips"], r3["n_phones"]) == (1, 1, 1)
    for tok in ("<EMAIL>", "<IP>", "<PHONE>"):
        assert tok in r3["text_scrubbed"]

    assert out[4]["text_scrubbed"] == ROWS[4][1]
    assert (out[5]["n_emails"], out[5]["n_ips"], out[5]["n_phones"]) == (0, 0, 0)
    assert out[5]["text_scrubbed"] == ROWS[5][1]


def test_ip_not_eaten_by_phone(spark):
    """Redaction order contract: the phone pattern must not consume
    IPv4 segments (its class has no dots)."""
    df = spark.createDataFrame(
        [(0, "ip 172.16.254.1 then phone 0123456789")], "doc_id bigint, text string"
    )
    row = pii_scrub(df).first()
    assert row["n_ips"] == 1 and row["n_phones"] == 1
    assert "<IP> then phone <PHONE>" in row["text_scrubbed"]


def test_scrub_is_pure_expression(spark):
    """No shuffle: the scrubbed projection's physical plan is scan +
    project only."""
    df = spark.createDataFrame(ROWS, "doc_id bigint, text string")
    plan = (
        pii_scrub(df)
        .select("doc_id", "n_emails", "text_scrubbed")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


# --- k-anonymity / l-diversity report ---

import pytest
from etl_mudah_spark.operators.pii import k_anonymity_report  # noqa: E402


def test_k_anonymity_counts_and_l_diversity(spark):
    rows = [
        # class (A, x): 3 members, sensitive {1, 1, 2} -> l = 2
        ("A", "x", 1), ("A", "x", 1), ("A", "x", 2),
        # class (B, y): 1 member (below k=2), sensitive {7} -> l = 1
        ("B", "y", 7),
    ]
    df = spark.createDataFrame(rows, "qa string, qb string, s long")
    r = k_anonymity_report(df, ["qa", "qb"], "s", k=2).first()
    assert (r.k, r.n_rows, r.n_classes) == (2, 4, 2)
    assert r.min_class_size == 1
    assert r.classes_below_k == 1 and r.rows_below_k == 1
    assert r.pct_below_k == 25.0
    assert r.min_l_diversity == 1


def test_k_anonymity_null_sensitive_counts_as_value(spark):
    df = spark.createDataFrame(
        [("A", "1"), ("A", None), ("A", None)], "q string, s string"
    )
    r = k_anonymity_report(df, ["q"], "s", k=2).first()
    # distinct sensitive values: {"1", NULL-sentinel} -> 2.
    assert r.min_l_diversity == 2 and r.classes_below_k == 0


def test_k_anonymity_rejects_trivial_k(spark):
    df = spark.createDataFrame([("A", "1")], "q string, s string")
    with pytest.raises(ValueError):
        k_anonymity_report(df, ["q"], "s", k=1)
