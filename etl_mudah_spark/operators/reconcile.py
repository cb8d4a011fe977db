"""Replica reconciliation by bucketed signature fingerprints — the
anti-entropy / Merkle-tree idea (Cassandra repair, DynamoDB sync) as
plain DataFrame algebra.

Problem: two copies of a 100 TB table (a replica, a migration target,
yesterday's backup) must be verified equal — or their differences
FOUND — without shipping either table anywhere. Exchanging the rows is
O(data); exchanging per-bucket summaries is O(#buckets), and rows only
move for the buckets whose summaries disagree.

The signature is :func:`row_signature` — the repo's shared 31-bit
xorshift-multiply avalanche (operators/sketch.py ``hll_hash``) chained
over the row's column encodings, so both engines (and therefore the
registered query's DuckDB oracle) reproduce every fingerprint
bit-for-bit. Column encodings must be NON-NEGATIVE bigints (dates →
epoch days, decimals → floor(x·100); the caller chooses, because the
encoding IS the equality definition being verified). The per-bucket
summary is (row count, exact bigint signature sum, signature XOR):
order-independent, mergeable, and sensitive — a single changed row
flips sum and xor with probability ~1 (a specific pair of offsetting
changes inside one bucket can cancel the sum; the xor and count
columns are the cheap double-checks).

Scale shape: one map-side-combinable groupBy per table (the shuffle
carries #buckets rows), a #buckets-row join to find disagreeing
buckets, then the drill-down join touches ONLY rows whose bucket
disagrees — the 1-changed-row case reads two tables but shuffles
~2·|bucket| rows.

Reference analog: none — operational tooling the reference's
pandas-in-memory scale never needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_mudah_spark.operators.sketch import hll_hash


def row_signature(*cols: Column) -> Column:
    """31-bit row signature: the avalanche mixer chained over the
    column encodings (``mix(mix(c1) XOR c2) XOR c3 …``). Each ``cols``
    element must be a NON-NEGATIVE bigint expression — the encoding is
    part of the equality contract (e.g. ``F.datediff(d, '1970-01-01')``
    for dates, ``F.floor(x * 100).cast('bigint')`` for 2dp decimals —
    floor, not a raw bigint cast, because Spark truncates and DuckDB
    rounds on double→int casts)."""
    if not cols:
        raise ValueError("row_signature needs at least one column")
    sig = hll_hash(cols[0])
    for c in cols[1:]:
        sig = hll_hash(sig.bitwiseXOR(c))
    return sig


def table_fingerprint(
    df: DataFrame, sig: Column, n_buckets: int = 64
) -> DataFrame:
    """Per-bucket summary ``(bucket, n_rows, sig_sum, sig_xor)`` of the
    table under ``sig`` (a :func:`row_signature`). Signatures are
    < 2^31, so the bigint SUM is exact for up to 2^32 rows per bucket —
    order-independent by construction, like every artifact here."""
    return (
        df.select(sig.alias("_sig"))
        .groupBy(F.pmod(F.col("_sig"), F.lit(n_buckets)).cast("int").alias("bucket"))
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("_sig").alias("sig_sum"),
            F.bit_xor("_sig").alias("sig_xor"),
        )
    )


def fingerprint_diff(
    fp_a: DataFrame, fp_b: DataFrame
) -> DataFrame:
    """Buckets where two fingerprints disagree (full outer on bucket;
    a bucket present on one side only disagrees by definition).
    Returns (bucket, n_rows_a, n_rows_b, sum_match, xor_match)."""
    a = fp_a.select(
        "bucket",
        F.col("n_rows").alias("n_rows_a"),
        F.col("sig_sum").alias("_sum_a"),
        F.col("sig_xor").alias("_xor_a"),
    )
    b = fp_b.select(
        "bucket",
        F.col("n_rows").alias("n_rows_b"),
        F.col("sig_sum").alias("_sum_b"),
        F.col("sig_xor").alias("_xor_b"),
    )
    j = a.join(b, "bucket", "full_outer")
    return (
        j.where(
            ~(
                F.col("n_rows_a").eqNullSafe(F.col("n_rows_b"))
                & F.col("_sum_a").eqNullSafe(F.col("_sum_b"))
                & F.col("_xor_a").eqNullSafe(F.col("_xor_b"))
            )
        )
        .select(
            "bucket",
            F.coalesce("n_rows_a", F.lit(0)).alias("n_rows_a"),
            F.coalesce("n_rows_b", F.lit(0)).alias("n_rows_b"),
            F.col("_sum_a").eqNullSafe(F.col("_sum_b")).alias("sum_match"),
            F.col("_xor_a").eqNullSafe(F.col("_xor_b")).alias("xor_match"),
        )
    )


def reconcile_tables(
    a: DataFrame,
    b: DataFrame,
    sig: Column,
    n_buckets: int = 64,
) -> DataFrame:
    """One-row reconciliation report between two tables under the
    same signature: ``(n_buckets_diff, n_rows_scanned, only_in_a,
    only_in_b)``. Phase 1 compares fingerprints (#buckets rows moved);
    phase 2 drills into ONLY the disagreeing buckets, diffing row
    multisets by (bucket, signature) group counts — rows never leave
    their engine, and agreement costs no row movement at all.

    ``only_in_*`` count row-instances whose (signature, multiplicity)
    is unmatched — under the no-collision assumption (31-bit space vs
    bucket populations) these are the changed/missing rows.
    """
    # checkpoint once: three consumers (two drill joins + the count)
    # would otherwise re-run BOTH full-table fingerprint scans each —
    # the pagerank/sorted-neighborhood multi-consumer discipline, and
    # this frame is at most n_buckets rows.
    diff_buckets = (
        fingerprint_diff(
            table_fingerprint(a, sig, n_buckets),
            table_fingerprint(b, sig, n_buckets),
        )
        .select("bucket")
        .localCheckpoint(eager=True)
    )

    def sig_counts(df: DataFrame) -> DataFrame:
        return (
            df.select(sig.alias("_sig"))
            .withColumn(
                "bucket",
                F.pmod(F.col("_sig"), F.lit(n_buckets)).cast("int"),
            )
            .join(F.broadcast(diff_buckets), "bucket")
            .groupBy("bucket", "_sig")
            .agg(F.count("*").alias("_n"))
        )
    ca = sig_counts(a).withColumnRenamed("_n", "_na")
    cb = sig_counts(b).withColumnRenamed("_n", "_nb")
    j = ca.join(cb, ["bucket", "_sig"], "full_outer").select(
        F.coalesce("_na", F.lit(0)).alias("_na"),
        F.coalesce("_nb", F.lit(0)).alias("_nb"),
    )
    n_diff = diff_buckets.agg(F.count("*").alias("n_buckets_diff"))
    drill = j.agg(
        F.sum(F.col("_na")).cast("bigint").alias("n_rows_scanned"),
        F.sum(F.greatest(F.col("_na") - F.col("_nb"), F.lit(0)))
        .cast("bigint")
        .alias("only_in_a"),
        F.sum(F.greatest(F.col("_nb") - F.col("_na"), F.lit(0)))
        .cast("bigint")
        .alias("only_in_b"),
    )
    return n_diff.join(F.broadcast(drill)).select(
        "n_buckets_diff",
        F.coalesce("n_rows_scanned", F.lit(0)).alias("n_rows_scanned"),
        F.coalesce("only_in_a", F.lit(0)).alias("only_in_a"),
        F.coalesce("only_in_b", F.lit(0)).alias("only_in_b"),
    )
