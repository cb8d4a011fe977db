"""Decompose the streaming per-trigger latency floor (VERDICT r10 item 4).

The bench's 1-file-per-trigger pass shows ~0.9 s per micro-batch at
sf0.1 (16 batches over ~14 s) while the saturated single-trigger run
moves the same rows in ~2 s — so the floor is per-trigger OVERHEAD,
not compute. This script attributes it using the engine's own
telemetry: StreamingQueryProgress.durationMs splits every micro-batch
into
    latestOffset   source listing (which new files?)
    getBatch       source batch DataFrame construction
    queryPlanning  incremental Catalyst planning (per batch!)
    addBatch       execution: scan + agg + state round trip + sink
    walCommit      offset log fsync
    commitOffsets  commit log fsync
plus stateOperators[*].commitTimeMs (state-store checkpoint inside
addBatch). Run once with the default HDFSBackedStateStoreProvider and
once with RocksDBStateStoreProvider, same drop dir, fresh checkpoints.

Run SOLO; loadavg is printed for attribution. Results recorded in
BASELINE.md (round-11 notes).
"""
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from etl_mudah_spark.session import get_spark  # noqa: E402
from etl_mudah_spark.tables import load  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

N_FILES = 16
ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)

print("loadavg at start:", [round(x, 2) for x in os.getloadavg()])
spark = get_spark("stream-floor-decomp")
sf_dir = os.environ["SPARK_GRAFT_SF_DIR"]
scratch = tempfile.mkdtemp(prefix="stream_floor_")
drop = os.path.join(scratch, "drop")


def run_variant(label: str, provider: str | None) -> dict:
    if provider:
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass", provider
        )
    else:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    schema = spark.read.parquet(drop).schema
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
    q = (
        agg.writeStream.outputMode("update")
        .foreachBatch(
            lambda df, _i: df.write.mode("overwrite").format("noop").save()
        )
        .option("checkpointLocation", os.path.join(scratch, f"ckpt_{label}"))
        .start()
    )
    try:
        q.processAllAvailable()
        progress = [json.loads(p.json) for p in q.recentProgress]
    finally:
        q.stop()
    wall = time.perf_counter() - t0
    rows = sum(p.get("numInputRows", 0) for p in progress)
    comp: dict[str, list[float]] = {}
    for p in progress:
        if p.get("numInputRows", 0) == 0:
            continue  # trailing empty trigger
        for k, v in (p.get("durationMs") or {}).items():
            comp.setdefault(k, []).append(v / 1000.0)
        for so in p.get("stateOperators") or []:
            comp.setdefault("state.commit", []).append(
                so.get("commitTimeMs", 0) / 1000.0
            )
            comp.setdefault("state.rowsUpdated", []).append(
                so.get("numRowsUpdated", 0)
            )
    med = {k: round(statistics.median(v), 3) for k, v in comp.items()}
    n_batches = sum(1 for p in progress if p.get("numInputRows", 0) > 0)
    out = {
        "label": label,
        "wall_sec": round(wall, 2),
        "batches": n_batches,
        "rows_per_sec": round(rows / wall),
        "per_batch_sec": round(wall / max(1, n_batches), 3),
        "median_durations_sec": med,
    }
    print(json.dumps(out, indent=2), flush=True)
    return out


try:
    events = load(spark, sf_dir, "events")
    events.repartition(N_FILES).write.mode("overwrite").parquet(drop)
    # warm the noop sink + codegen once
    spark.read.parquet(drop).limit(10).write.mode("overwrite").format(
        "noop"
    ).save()
    results = [
        run_variant("hdfs_default", None),
        run_variant("rocksdb", ROCKSDB),
        # repeat the default to bracket drift
        run_variant("hdfs_default_rep2", None),
    ]
finally:
    spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    shutil.rmtree(scratch, ignore_errors=True)
print("loadavg at end:", [round(x, 2) for x in os.getloadavg()])
