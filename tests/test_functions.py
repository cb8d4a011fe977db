"""Unit tests for the scalar column-function library (reference UDF
parity, SURVEY §2.9: zero Python UDFs needed)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_mudah_spark.functions.core import (
    bucket_case,
    capitalize,
    fixed_width_bin,
    synonym_remap,
)

SEGS = ([25_000.0, 50_000.0, 100_000.0, 200_000.0],
        ["Budget", "Economy", "Mid-Range", "Premium", "Luxury"])


def test_bucket_case_boundaries(spark):
    df = spark.createDataFrame(
        [(0.0,), (24_999.99,), (25_000.0,), (99_999.0,), (200_000.0,), (10_000_000.0,)],
        "v double",
    )
    out = [r.seg for r in df.select(bucket_case("v", *SEGS).alias("seg")).collect()]
    # thresholds are exclusive upper bounds: v < t → label  (constants.py:26-36)
    assert out == ["Budget", "Budget", "Economy", "Mid-Range", "Luxury", "Luxury"]


def test_fixed_width_bin_clip_and_edges(spark):
    df = spark.createDataFrame([(0.0,), (19_999.0,), (20_000.0,), (500_000.0,)], "v double")
    out = [r.b for r in df.select(fixed_width_bin("v", 20_000.0, clip=200_000.0).alias("b")).collect()]
    assert out == [0, 0, 1, 10]  # left-closed [a,b); clip → last bin


def test_capitalize_exact_semantics(spark):
    df = spark.createDataFrame([("1-URGENT",), ("hello world",), ("",)], "s string")
    out = [r.c for r in df.select(capitalize(F.col("s")).alias("c")).collect()]
    # str.capitalize: first char upper, ALL the rest lower (not initcap)
    assert out == ["1-urgent", "Hello world", ""]


def test_synonym_remap_with_identity_fallback(spark):
    mapping = {"Penang": "Pulau Pinang", "KL": "W.P. Kuala Lumpur"}
    df = spark.createDataFrame([("Penang",), ("KL",), ("Johor",)], "loc string")
    out = [r.n for r in df.select(synonym_remap("loc", mapping).alias("n")).collect()]
    assert out == ["Pulau Pinang", "W.P. Kuala Lumpur", "Johor"]


def test_format_currency_and_pct(spark):
    from etl_mudah_spark.functions.core import format_currency, format_pct

    df = spark.createDataFrame([(12345.678, 12.34)], "price double, pct double")
    row = df.select(
        format_currency("price").alias("c0"),
        format_currency("price", decimals=2).alias("c2"),
        format_pct("pct").alias("p"),
    ).first()
    # parity with the reference's 'RM {:,.0f}' / '{:.1f}%' f-strings
    # (regional_analysis.py:162-164,183-184)
    assert row["c0"] == "RM 12,346"
    assert row["c2"] == "RM 12,345.68"
    assert row["p"] == "12.3%"


def test_dsum2_domain_holds_on_every_lineitem_column_it_sums():
    """ADVICE r10: dsum2's compact decimal(8,2) lattice nulls-and-drops
    out-of-range values IDENTICALLY on both twins, so a data-domain
    break would keep parity green while both sums silently diverge from
    the true value. This audit makes a domain break fail loudly: every
    column the engine runs through dsum2 (pricing_summary's factorized
    Q1 and big_orders' per-order quantity sums) must round-trip the
    (8,2) cast exactly — no introduced NULLs (range) and no value drift
    (precision) — at every test scale. Footer-fast via DuckDB."""
    import duckdb

    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        rel = f"'/root/testdata/{sf}/lineitem.parquet'"
        for c in cols:
            bad = duckdb.sql(
                f"SELECT COUNT(*) FROM {rel} WHERE {c} IS NOT NULL AND ("
                f"TRY_CAST({c} AS DECIMAL(8,2)) IS NULL OR "
                f"CAST(TRY_CAST({c} AS DECIMAL(8,2)) AS DOUBLE) <> {c})"
            ).fetchone()[0]
            assert bad == 0, (
                f"{sf}.{c}: {bad} rows violate the dsum2 2dp/|v|<1e6 "
                "domain contract (functions/core.py) — the compact "
                "lattice would silently mis-sum on BOTH twins"
            )
