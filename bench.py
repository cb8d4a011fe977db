#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
one JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed end-to-end (plan build + execution + a count-style
materialization) after a warm-up query primes the JVM/codegen.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from datetime import datetime
from pathlib import Path

import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent))

import etl_mudah_spark.plans  # noqa: F401
from etl_mudah_spark.operators.merge import merge_upsert
from etl_mudah_spark.plans import registry
from etl_mudah_spark.session import get_spark

# Median-of-N timing (round 5; was best-of-3): per-query SESSION noise
# at sub-second magnitudes measured ±30% across rounds, which made
# regression attribution guesswork — the median of 5 is stable to ~10%
# between sessions while still absorbing warm-up stragglers.
N_REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5"))

# Headline set: the queries whose shape dominates 100 TB workloads —
# full-scan agg, star join, window, dedup sketching, ANN.
HEADLINE = [
    "pricing_summary",
    "region_revenue",
    "top_customers",
    "price_segments",
    "keep_one_per_order",
    "top3_orders_per_customer",
    "shipping_priority",
    "big_orders",
    "events_hourly",
    "events_sessionize",
    "doc_minhash_near_dup",
    "doc_token_stats",
    "ann_bruteforce_topk",
    "emb_cosine_near_dup_lsh",
]


def _minhash_production(spark, sf_dir: str):
    from etl_mudah_spark.operators import dedup as dd
    from etl_mudah_spark.tables import load

    return dd.minhash_near_duplicates(
        load(spark, sf_dir, "documents"), num_hashes=32, bands=8, threshold=0.2
    )


def _lsh_cosine_production(spark, sf_dir: str):
    from etl_mudah_spark.operators import similarity as sim
    from etl_mudah_spark.plans.datapipe import EMB_DIM
    from etl_mudah_spark.tables import load

    return sim.cosine_near_duplicates(
        load(spark, sf_dir, "embeddings"),
        threshold=0.45,
        target_recall=0.95,
        max_tables=96,
        dim=EMB_DIM,
    )


# Round 5 turned the registered sketch queries into invariant harnesses
# that ALSO run an exact verification twin — correct for the driver's
# hash check, wrong for throughput measurement. The bench times the
# production operators themselves (the plans a user runs at scale),
# keeping the series comparable with rounds 1-4.
BENCH_FNS = {
    "doc_minhash_near_dup": _minhash_production,
    "emb_cosine_near_dup_lsh": _lsh_cosine_production,
}


def bench_merge_upsert(spark, sf_dir: str) -> float:
    """Time the S7 merge/upsert write path (operators/merge.py): merge a
    staged batch (latest order-year repriced + 1000 brand-new keys) into
    a year-partitioned copy of ``orders``.

    The batch touches ONE partition of eight, so the timed region
    exercises the whole production shape: batch-partition semi-scan,
    key-shuffle merge window, staged write, dynamic partition overwrite.
    Table setup/reset runs OUTSIDE the timer each rep (the merge mutates
    its target, so every rep needs a fresh copy).
    """
    from pyspark.sql import functions as F

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumn(
        "o_year", F.year("o_orderdate")
    )
    max_year, max_key = orders.agg(
        F.max("o_year"), F.max("o_orderkey")
    ).first()
    batch_ts = datetime(2026, 1, 1)
    # Staged batch: every latest-year order repriced +5%, plus 1000 new
    # synthetic keys — the reference's daily-scrape shape (update-heavy,
    # some inserts, one hot partition).
    repriced = orders.where(F.col("o_year") == max_year).withColumn(
        "o_totalprice", F.round(F.col("o_totalprice") * 1.05, 2)
    )
    # Deterministic insert rows (orderBy before limit), offset past the
    # true max key — a fixed +10M constant collides with real keys at
    # sf>=2 and would silently stop exercising the insert path.
    new_keys = repriced.orderBy("o_orderkey").limit(1000).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(int(max_key) + 1)
    )
    staged = repriced.unionByName(new_keys)
    staged.cache().count()  # staged batch is input, not the thing timed

    scratch = tempfile.mkdtemp(prefix="bench_merge_")
    table = f"{scratch}/orders_tbl"
    best = float("inf")
    try:
        for _ in range(N_REPS):
            shutil.rmtree(table, ignore_errors=True)
            orders.write.mode("overwrite").partitionBy("o_year").parquet(table)
            t0 = time.perf_counter()
            merge_upsert(
                spark,
                staged,
                table,
                key_cols=["o_orderkey"],
                order_cols=["o_orderdate", "o_orderkey"],
                partition_col="o_year",
                created_col=None,
                updated_col=None,
                batch_ts=batch_ts,
            )
            best = min(best, time.perf_counter() - t0)
    finally:
        staged.unpersist()
        shutil.rmtree(scratch, ignore_errors=True)
    return round(best, 3)


def run_headline(spark, sf_dir: str, label: str) -> dict[str, float]:
    """Median-of-N_REPS wall time per headline query against ``sf_dir``."""
    import statistics

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = BENCH_FNS.get(name) or registry.REGISTRY[name].spark_fn
        reps = []
        for _ in range(N_REPS):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            # noop sink: full execution of every column, nothing
            # collected — count() would let Catalyst prune the computed
            # columns away.
            df.write.mode("overwrite").format("noop").save()
            reps.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(reps), 3)
        print(
            f"  [{label}] {name}: {timings[name]}s (median of {N_REPS})",
            file=sys.stderr,
        )
    return timings


def stage_multifile(
    spark, sf_dir: str, scratch: str, target_bytes: int = 512 * 1024, cap: int = 32
) -> str:
    """Rewrite each table as multiple parquet files sized to
    ``target_bytes`` so scans parallelize across cores.

    The driver's testdata is one file / one row group per table, which
    pins every Spark scan to a single task no matter how many cores
    exist — the single-file ratio vs DuckDB measures that artifact, not
    engine throughput. File count follows SIZE, never a fixed fan-out:
    a fixed 32-way split was measured to HURT (a 0.8 MB embeddings
    table as 32 near-empty files costs a task + Python-worker spin-up
    per file in the UDF-bearing queries, +70% on the LSH query).

    Round 5: the rewrite IS operators/layout.py:compact_files (copy the
    single source file in, then compact in place) — the bench measures
    the layout the production compaction path actually produces, not a
    hand-rolled duplicate of its size policy.
    """
    from etl_mudah_spark.operators.layout import compact_files
    from etl_mudah_spark.tables import TABLES

    dst_dir = os.path.join(scratch, "multifile")
    os.makedirs(dst_dir, exist_ok=True)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for name in TABLES:
        src = f"{sf_dir}/{name}.parquet"
        dst = f"{dst_dir}/{name}.parquet"
        os.makedirs(dst, exist_ok=True)
        shutil.copy(src, os.path.join(dst, "part-00000.parquet"))
        compact_files(
            spark, dst, target_file_bytes=target_bytes, max_files=cap
        )
    return dst_dir


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    multifile = os.environ.get("SPARK_GRAFT_MULTIFILE", "1") != "0"
    spark = get_spark("bench")

    # Warm up JVM + codegen + parquet footer caches.
    registry.REGISTRY["pricing_summary"].spark_fn(spark, sf_dir).collect()
    # Warm up the Python UDF workers too (fork + pandas/numpy import +
    # Arrow init costs ~2-3 s on first use and belongs to the session,
    # not to whichever sketch query happens to run first).
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _warm(v: pd.Series) -> pd.Series:
        return v

    spark.range(64).select(_warm(F.col("id").cast("double"))).collect()

    timings = run_headline(spark, sf_dir, "1file")
    # Headline total stays on the same 14-query set as rounds 1-3 for
    # round-over-round comparability; merge is reported separately.
    total = round(sum(timings.values()), 3)
    merge_sec = bench_merge_upsert(spark, sf_dir)
    print(f"  merge_upsert_batch: {merge_sec}s (best of {N_REPS})", file=sys.stderr)

    result = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "merge_upsert_batch": merge_sec,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "methodology": {
            "reps": N_REPS,
            "stat": "median",
            "sink": "noop",
            "merge_stat": "best",  # setup-dominated; best isolates the merge
        },
    }

    if multifile:
        # Second scale point: same queries, same data, 32-file layout —
        # isolates scan parallelism from the single-file artifact.
        scratch = tempfile.mkdtemp(prefix="bench_multifile_")
        try:
            mf_dir = stage_multifile(spark, sf_dir, scratch)
            mf_timings = run_headline(spark, mf_dir, "multifile")
            result["queries_multifile"] = mf_timings
            result["value_multifile"] = round(sum(mf_timings.values()), 3)
            result["multifile_policy"] = {"target_bytes": 512 * 1024, "cap": 32}
        finally:
            shutil.rmtree(scratch, ignore_errors=True)

    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
