"""Resumable partition backfill (operators/backfill.py): crash-resume
exactly-at-the-failed-partition, bounded runs, and the end-to-end
composition with a real per-partition Spark transform."""

from __future__ import annotations

import pytest

from etl_mudah_spark.operators.backfill import backfill_run


def test_crash_resume_processes_each_partition_once(tmp_path):
    ledger = str(tmp_path / "ledger")
    parts = [f"day={d:02d}" for d in range(1, 6)]
    seen: list[str] = []
    in_allowed: set = set()

    def boom_on_third(pid: str) -> None:
        if pid == "day=03" and "day=03" not in in_allowed:
            raise RuntimeError("transient failure")
        seen.append(pid)
    with pytest.raises(RuntimeError):
        backfill_run(parts, ledger, boom_on_third)
    assert seen == ["day=01", "day=02"]  # 3 failed, 4/5 never started

    in_allowed.add("day=03")  # "the transient issue clears"
    summary = backfill_run(parts, ledger, boom_on_third)
    # resume starts AT the failed partition; completed ones never rerun
    assert seen == parts
    assert summary == {
        "processed": ["day=03", "day=04", "day=05"],
        "skipped": 2,
        "remaining": 0,
    }
    # a further run is a no-op
    assert backfill_run(parts, ledger, boom_on_third)["processed"] == []


def test_bounded_runs_drain_incrementally(tmp_path):
    ledger = str(tmp_path / "ledger")
    parts = [str(i) for i in range(7)]
    runs = []
    while True:
        s = backfill_run(parts, ledger, lambda pid: None, max_per_run=3)
        runs.append(len(s["processed"]))
        if s["remaining"] == 0:
            break
    assert runs == [3, 3, 1]


def test_duplicate_partition_ids_rejected(tmp_path):
    with pytest.raises(ValueError, match="duplicate"):
        backfill_run(["a", "a"], str(tmp_path / "l"), lambda p: None)


def test_backfill_composes_with_spark_partition_rewrites(spark, tmp_path):
    """The real shape: each unit reads one source partition, transforms,
    writes one target partition; after a full drain the target equals
    the one-shot transform of the whole source."""
    import pyspark.sql.functions as F

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    spark.range(0, 300).select(
        "id", (F.col("id") % 3).alias("day"), (F.col("id") * 2.0).alias("v")
    ).write.partitionBy("day").parquet(src)

    def process(pid: str) -> None:
        d = int(pid.split("=")[1])
        (
            spark.read.parquet(f"{src}/day={d}")
            .withColumn("v2", F.col("v") * 10)
            .write.mode("overwrite")
            .parquet(f"{dst}/day={d}")
        )

    parts = [f"day={d}" for d in range(3)]
    s = backfill_run(parts, str(tmp_path / "ledger"), process)
    assert s["remaining"] == 0
    got = spark.read.parquet(dst)
    assert got.count() == 300
    assert got.agg(F.sum("v2")).first()[0] == sum(i * 20.0 for i in range(300))
