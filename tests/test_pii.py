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
