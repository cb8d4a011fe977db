"""Round-14 probe: does the streaming-floor series' per-trigger cost
change under the RocksDB state-store provider?

BASELINE.md §13 decomposed the 1-file/trigger floor into the per-trigger
state-store commit ledger (one delta file per state partition per
trigger on the default HDFS-backed provider). RocksDB is the production
provider for LARGE state; at this series' tiny state (~800 groups) its
per-commit machinery (changelog/snapshot zip per partition) may cost
more, not less. This probe answers it empirically: the exact
bench_streaming floor pipeline (16 drop files, 1/trigger, watermark +
tumbling window + count/sum, update mode, foreachBatch noop), run
alternately under the HDFS and RocksDB providers in one session
(provider is read per-query at stream start), reps interleaved.

Usage: python scripts/stream_floor_provider_ab.py [--reps N] [--parts P]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from etl_mudah_spark.session import get_spark
from etl_mudah_spark.tables import load

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)
HDFS = (
    "org.apache.spark.sql.execution.streaming.state."
    "HDFSBackedStateStoreProvider"
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--parts", type=int, default=None,
                    help="override spark.sql.shuffle.partitions for the "
                    "stream (default: leave the session's 32)")
    ap.add_argument("--files", type=int, default=16)
    args = ap.parse_args()

    spark = get_spark()
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")

    scratch = tempfile.mkdtemp(prefix="floor_provider_ab_")
    drop = os.path.join(scratch, "drop")
    events = load(spark, SF_DIR, "events")
    n_rows = events.count()
    events.repartition(args.files).write.mode("overwrite").parquet(drop)
    schema = spark.read.parquet(drop).schema

    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    if args.parts:
        spark.conf.set("spark.sql.shuffle.partitions", str(args.parts))

    def one_run(provider: str, rep: int) -> tuple[float, int]:
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass", provider
        )
        batches: list[int] = []

        def sink(batch_df, batch_id: int) -> None:
            batch_df.write.mode("overwrite").format("noop").save()
            batches.append(batch_id)

        agg = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(drop)
            .withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(
                F.count("*").alias("cnt"),
                F.sum(F.col("value").cast("decimal(18,6)"))
                .cast("double")
                .alias("total_value"),
            )
        )
        t0 = time.perf_counter()
        q = agg.writeStream.outputMode("update").foreachBatch(sink).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return time.perf_counter() - t0, len(batches)

    tags = {"hdfs": HDFS, "rocksdb": ROCKSDB}
    walls: dict[str, list[float]] = {t: [] for t in tags}
    try:
        order = list(tags)
        for rep in range(args.reps):
            rot = order[rep % 2:] + order[: rep % 2]
            for tag in rot:
                wall, nb = one_run(tags[tag], rep)
                walls[tag].append(wall)
                print(
                    f"  {tag} rep{rep}: {wall:.2f}s wall, {nb} batches, "
                    f"{round(n_rows / wall)} rows/s, "
                    f"{wall / max(1, nb):.3f} s/batch",
                    flush=True,
                )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        shutil.rmtree(scratch, ignore_errors=True)

    for tag, ts in walls.items():
        s = sorted(ts)
        print(
            f"FLOOR {tag} (parts={args.parts or prev_parts}): "
            f"min {s[0]:.2f} med {s[len(s) // 2]:.2f} wall; rows/s at med "
            f"{round(n_rows / s[len(s) // 2])}; all {[round(t, 2) for t in ts]}"
        )


if __name__ == "__main__":
    main()
