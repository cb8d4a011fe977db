"""Incremental ingest as Structured Streaming: file-source micro-batches
→ flatten → foreachBatch merge-upsert.

This is the reference's whole ETL contract (SURVEY.md §2.8) in one
streaming pipeline: the 12-hourly Airflow re-scrape becomes a stream of
raw listing files (in production: the REST DataSource output landed to
a drop zone, or Kafka); each micro-batch flattens the nested API shape
(operators/flatten.py) and merges into the target table with
last-write-wins-by-key semantics (operators/merge.py) — idempotent
under replay, exactly like the reference's ON CONFLICT upsert
(dags/dag.py:250-266) but with a deterministic survivor.

``foreachBatch`` is the right tool (vs a direct streaming sink)
because merge is not an append — it reads+rewrites target partitions.
Spark guarantees per-batch atomicity via the checkpoint; merge
idempotency (same batch applied twice → same table) covers the
at-least-once edge around failures.

Scale: each micro-batch's merge cost is bounded by the touched
partitions (merge_upsert prunes via partition_col), not table size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_mudah_spark.operators.flatten import flatten_listings
from etl_mudah_spark.operators.merge import merge_upsert
from etl_mudah_spark.schemas import API_LISTING


def stream_ingest_listings(
    spark: SparkSession,
    drop_dir: str,
    table_path: str,
    checkpoint_dir: str,
    *,
    partition_col: str | None = None,
    batch_ts=None,
    max_files_per_trigger: int = 1,
) -> None:
    """Run the drop-zone → merged-table pipeline to completion
    (Trigger.AvailableNow semantics via processAllAvailable).

    ``drop_dir`` holds JSON-lines files of raw API listings (the
    ``data[]`` elements: ``{"id": ..., "attributes": {...}}``).
    """

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        flat = flatten_listings(batch)
        if not flat.isEmpty():
            # Per-batch stamp derived from the batch's own data (max
            # listing_date), not a single stream-start timestamp: each
            # micro-batch gets its own updated_at, and a replayed batch
            # reproduces the same stamp (idempotent under the
            # at-least-once edge). An explicit batch_ts overrides.
            ts = batch_ts
            if ts is None:
                ts = flat.agg(F.max("listing_date")).first()[0]
            merge_upsert(
                spark,
                flat,
                table_path,
                key_cols=["listing_id"],
                order_cols=["listing_date", "listing_id"],
                partition_col=partition_col,
                batch_ts=ts,
            )

    stream = (
        spark.readStream.schema(API_LISTING)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .json(drop_dir)
    )
    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
