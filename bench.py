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
import sys
import time
from pathlib import Path

import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent))

import etl_mudah_spark.plans  # noqa: F401
from etl_mudah_spark.plans import registry
from etl_mudah_spark.session import get_spark

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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
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

    timings: dict[str, float] = {}
    for name in HEADLINE:
        q = registry.REGISTRY[name]
        t0 = time.perf_counter()
        df = q.spark_fn(spark, sf_dir)
        # noop sink: full execution of every column, nothing collected —
        # count() would let Catalyst prune the computed columns away.
        df.write.mode("overwrite").format("noop").save()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"  {name}: {timings[name]}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
