"""Structured Streaming surface.

The reference's incremental contract (SURVEY.md §2.8) is a 12-h batch
re-scrape with idempotent upsert — here expressed as real streams:

- ``stream_hourly_event_counts``: file-source stream → watermarked
  tumbling-window aggregation → memory sink (complete mode), driven to
  completion synchronously with ``processAllAvailable`` so the result
  is comparable against a batch/DuckDB oracle.
- ``stream_dedup_events``: watermark + dropDuplicatesWithinWatermark —
  the streaming twin of SURVEY §2 D1.

At production scale the same plans run against Kafka with a real
trigger; the file source here is the test harness (same logical plan,
different source — that is the point of Structured Streaming).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id bigint, ts bigint, user_id bigint, event_type string, "
    "value double, props string"
)


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ts arrives as INT64 nanos (Spark 4 won't read TIMESTAMP(NANOS)
    # natively) — declare bigint and convert with integer division.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    )


def stream_hourly_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windowed counts/sums per event_type, computed by a
    real streaming query and returned as a batch DataFrame.

    Complete output mode + memory sink; a 10-minute watermark bounds
    state in the append-mode production variant.
    """
    name = f"hourly_events_{uuid.uuid4().hex[:8]}"
    agg = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("hour_start"), "event_type", "cnt", "total_value")
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # Materialize before the memory sink is dropped.
    out = spark.table(name)
    result = spark.createDataFrame(out.collect(), out.schema)
    return result


def stream_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup on event_id within a watermark, counted per type."""
    name = f"dedup_events_{uuid.uuid4().hex[:8]}"
    deduped = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.table(name)
    result = spark.createDataFrame(out.collect(), out.schema) if out.count() else out
    return (
        result.groupBy("event_type").agg(F.count("*").alias("cnt"))
    )


def stream_view_purchase_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join: purchases attributed to a prior
    view by the same user within 30 minutes.

    Both sides are watermarked and the join condition carries the time
    interval, so Spark can BOUND the join state (a view's state expires
    once the purchase-side watermark passes view_ts + 30 min) — the
    only formulation that survives an unbounded stream; an
    unconstrained stream-stream equi-join would buffer both streams
    forever. Output: per-user attributed-purchase counts, comparable
    to the batch/DuckDB interval-join oracle.
    """
    name = f"vp_join_{uuid.uuid4().hex[:8]}"
    views = (
        _events_stream(spark, sf_dir)
        .where(F.col("event_type") == "view")
        .select(F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts"))
        .withWatermark("v_ts", "1 hour")
    )
    purchases = (
        _events_stream(spark, sf_dir)
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("p_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = views.join(
        purchases,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 30 MINUTES")),
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.table(name)
    result = spark.createDataFrame(out.collect(), out.schema) if out.count() else out
    # one row per attributed (view, purchase) pair -> distinct purchases
    # per user (a purchase may match several prior views)
    return (
        result.select("p_user", "p_id")
        .distinct()
        .groupBy(F.col("p_user").alias("user_id"))
        .agg(F.count("*").alias("attributed_purchases"))
    )
