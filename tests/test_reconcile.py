"""Replica reconciliation (operators/reconcile.py): the Python-oracle
mixer parity, the zero-movement identity case, and directional diffs
(modified / missing / extra rows)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_mudah_spark.operators.reconcile import (
    fingerprint_diff,
    reconcile_tables,
    row_signature,
    table_fingerprint,
)

M, MULT = 1 << 31, 0x45D9F3B


def _py_hash(x: int) -> int:
    x %= M
    for _ in range(2):
        x = (((x >> 16) ^ x) * MULT) % M
    return (x >> 16) ^ x


def _py_sig(*vals: int) -> int:
    s = _py_hash(vals[0])
    for v in vals[1:]:
        s = _py_hash(s ^ v)
    return s


def test_row_signature_matches_python(spark):
    rows = [(0, 7), (42, 0), (123456789, 987654321), (2**40, 3)]
    df = spark.createDataFrame(rows, "a bigint, b bigint")
    got = [
        r["s"]
        for r in df.select(
            row_signature(F.col("a"), F.col("b")).alias("s")
        ).collect()
    ]
    assert got == [_py_sig(a, b) for a, b in rows]


def test_reconcile_identical_tables_zero_everything(spark):
    df = spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") * 13 % 97).alias("v")
    )
    sig = row_signature(F.col("k"), F.col("v"))
    assert fingerprint_diff(
        table_fingerprint(df, sig, 32), table_fingerprint(df, sig, 32)
    ).count() == 0
    r = reconcile_tables(df, df, sig, n_buckets=32).collect()[0]
    assert tuple(r) == (0, 0, 0, 0)


def test_reconcile_finds_modified_missing_and_extra(spark):
    base = spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") * 13 % 97).alias("v")
    )
    # replica: row k=5 modified, row k=7 missing, one extra row k=9999
    replica = (
        base.withColumn(
            "v", F.when(F.col("k") == 5, F.lit(9999)).otherwise(F.col("v"))
        )
        .where(F.col("k") != 7)
        .unionByName(
            base.sparkSession.createDataFrame([(9999, 1)], "k bigint, v bigint")
        )
    )
    sig = row_signature(F.col("k"), F.col("v"))
    r = reconcile_tables(base, replica, sig, n_buckets=32).collect()[0]
    # modified row counts on both sides; missing only in base; extra only
    # in replica
    assert r["only_in_a"] == 2  # old version of k=5 + the missing k=7
    assert r["only_in_b"] == 2  # new version of k=5 + the extra k=9999
    assert r["n_buckets_diff"] >= 1
    # drill-down scanned only disagreeing buckets, not the table
    assert r["n_rows_scanned"] < 2000
