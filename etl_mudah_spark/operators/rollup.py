"""Persisted mergeable-sketch rollups — the continuous-aggregate /
"hypertable rollup" pattern at 100 TB.

An exact COUNT(DISTINCT key) per time bucket must rescan the fact table
for every new grain (hourly -> daily -> weekly each pay the full
shuffle). A persisted sketch table changes the cost model: one O(fact)
pass builds fixed-size HLL sketches at the finest grain, and every
coarser grain is answered from the SKETCH TABLE alone — hll_union_agg
over a few thousand rows of opaque bytes, never the fact table. This is
the published Datasketches/BigQuery/Druid pattern (mergeable summaries
make pre-aggregation composable); Spark 3.5+ exposes it natively as
hll_sketch_agg / hll_union_agg / hll_sketch_estimate.

Scale shape:
- build: one shuffle of the fact table on the bucket key; output is
  O(#buckets) rows x ~KB sketch bytes — pennies to store, partitioned
  by date so incremental refresh overwrites only new partitions.
- rollup: reads only the sketch table; the union agg is associative,
  so partial merges happen map-side. Grain coarsening never touches
  the fact table again.

The estimate is approximate (HLL standard error ~1.6% at the default
lgConfigK); exact twins + invariant bounds live in the registered query
(plans/eventsq.py:events_daily_users_rollup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build_sketch_table(
    events: DataFrame,
    path: str,
    time_col: str = "ts",
    key_col: str = "user_id",
    group_cols: tuple[str, ...] = (),
    grain: str = "hour",
) -> None:
    """One-time (or per-refresh) O(fact) pass: persist per-``grain``
    HLL sketches of ``key_col`` (plus exact event counts) partitioned
    by date for incremental overwrite."""
    bucketed = events.groupBy(
        F.date_trunc(grain, time_col).alias("bucket_ts"), *group_cols
    ).agg(
        F.hll_sketch_agg(key_col).alias("sk"),
        F.count("*").alias("events"),
    )
    (
        bucketed.withColumn("bucket_date", F.to_date("bucket_ts"))
        .write.mode("overwrite")
        .partitionBy("bucket_date")
        .parquet(path)
    )


def rollup_distinct(
    spark: SparkSession,
    path: str,
    grain: str = "day",
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Distinct-key estimate per coarser ``grain`` from the persisted
    sketch table ONLY — no fact-table access. Returns
    ``(bucket_ts, approx_users, events)``."""
    sk = spark.read.parquet(path)
    return (
        sk.groupBy(F.date_trunc(grain, "bucket_ts").alias("bucket_ts"), *group_cols)
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
            F.sum("events").alias("events"),
        )
    )
