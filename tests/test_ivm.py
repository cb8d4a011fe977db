"""Incremental view maintenance (operators/ivm.py).

The load-bearing property: applying table_diff(v1, v2) to the v1
aggregate yields EXACTLY the v2 aggregate — for arbitrary mutations
including group-migrating updates, whole-group deletions, inserts
into new groups, and null group keys. Plus the plan property that
makes it IVM at all: the refresh never touches the fact table.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from etl_mudah_spark.operators.cdc import table_diff
from etl_mudah_spark.operators.ivm import incremental_agg, summing_agg

_SCHEMA = "k int, grp string, val double"


def _mk(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA).withColumn(
        "val", F.col("val").cast("decimal(18,6)")
    )


def _agg_to_dict(df):
    return {
        r["grp"]: (r["cnt"], r["total"])
        for r in df.select(
            "grp", "cnt", F.col("total").cast("double").alias("total")
        ).collect()
    }


def _check(spark, v1_rows, v2_rows):
    v1 = _mk(spark, v1_rows)
    v2 = _mk(spark, v2_rows)
    base = summing_agg(v1, ["grp"], {"total": "val"})
    diff = table_diff(v1, v2, ["k"], compare_cols=["grp", "val"])
    got = incremental_agg(base, diff, ["grp"], {"total": "val"})
    want = summing_agg(v2, ["grp"], {"total": "val"})
    assert _agg_to_dict(got) == _agg_to_dict(want)


def test_insert_delete_update_and_group_migration(spark):
    v1 = [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0), (4, "c", 40.0)]
    v2 = [
        (2, "a", 25.0),  # in-group measure update
        (3, "a", 30.0),  # migrates b -> a (debits b, credits a)
        (4, "c", 40.0),  # untouched
        (5, "d", 50.0),  # insert into a brand-new group
        # 1 deleted -> a loses a row; b now empty -> group must vanish
    ]
    v1 = [(k, g, float(v)) for k, g, v in v1]
    _check(spark, v1, v2)


def test_whole_group_deletion_drops_group(spark):
    v1 = [(1, "only", 5.0), (2, "keep", 7.0)]
    v2 = [(2, "keep", 7.0)]
    v1_df = _mk(spark, v1)
    v2_df = _mk(spark, v2)
    base = summing_agg(v1_df, ["grp"], {"total": "val"})
    diff = table_diff(v1_df, v2_df, ["k"], compare_cols=["grp", "val"])
    got = incremental_agg(base, diff, ["grp"], {"total": "val"})
    assert _agg_to_dict(got) == {"keep": (1, 7.0)}


def test_null_group_keys_and_null_measures(spark):
    v1 = [(1, None, 1.0), (2, None, None), (3, "g", 3.0)]
    v2 = [(1, None, 2.0), (3, None, 3.0), (4, "g", None)]
    _check(spark, v1, v2)


def test_randomized_mutations_match_recompute(spark):
    rng = random.Random(17)
    groups = ["a", "b", "c", None]
    v1 = [
        (k, rng.choice(groups), float(rng.randint(0, 100)))
        for k in range(60)
    ]
    v2 = []
    for k, g, v in v1:
        r = rng.random()
        if r < 0.2:
            continue  # delete
        if r < 0.5:
            v2.append((k, rng.choice(groups), float(rng.randint(0, 100))))
        else:
            v2.append((k, g, v))  # unchanged
    v2 += [(100 + i, rng.choice(groups), float(i)) for i in range(10)]
    _check(spark, v1, v2)


def test_refresh_is_chainable(spark):
    """A refreshed aggregate is itself refreshable: v1 -> v2 -> v3
    applied as two successive diffs equals the v3 recompute."""
    v1 = [(1, "a", 1.0), (2, "b", 2.0)]
    v2 = [(1, "a", 5.0), (3, "b", 3.0)]
    v3 = [(3, "c", 3.0), (4, "a", 4.0)]
    d1, d2, d3 = (_mk(spark, v) for v in (v1, v2, v3))
    agg = summing_agg(d1, ["grp"], {"total": "val"})
    agg = incremental_agg(
        agg, table_diff(d1, d2, ["k"], compare_cols=["grp", "val"]),
        ["grp"], {"total": "val"},
    )
    agg = incremental_agg(
        agg, table_diff(d2, d3, ["k"], compare_cols=["grp", "val"]),
        ["grp"], {"total": "val"},
    )
    assert _agg_to_dict(agg) == _agg_to_dict(
        summing_agg(d3, ["grp"], {"total": "val"})
    )


def test_refresh_plan_never_scans_the_fact_table(spark, tmp_path):
    """The point of IVM: feed a PRE-COMPUTED change feed (as a CDF
    scan would) and assert the refresh plan reads only the stored
    aggregate and the diff — zero fact-table files touched."""
    fact_path = str(tmp_path / "fact")
    _mk(spark, [(k, "g", 1.0) for k in range(100)]).write.parquet(fact_path)
    fact = spark.read.parquet(fact_path)
    base = summing_agg(fact, ["grp"], {"total": "val"})

    agg_path = str(tmp_path / "agg")
    base.write.parquet(agg_path)
    stored = spark.read.parquet(agg_path)

    diff = spark.createDataFrame(
        [(200, "insert", None, None, "g", 9.0)],
        "k int, change_type string, old_grp string, "
        "old_val double, new_grp string, new_val double",
    ).select(
        "k", "change_type", "old_grp", "new_grp",
        F.col("old_val").cast("decimal(18,6)").alias("old_val"),
        F.col("new_val").cast("decimal(18,6)").alias("new_val"),
    )
    refreshed = incremental_agg(stored, diff, ["grp"], {"total": "val"})
    plan = refreshed._jdf.queryExecution().executedPlan().toString()
    assert "fact" not in plan and agg_path in plan
    assert _agg_to_dict(refreshed) == {"g": (101, 109.0)}


def test_streaming_ivm_refresh_end_to_end(spark, tmp_path):
    """CDC feed -> streaming incremental refresh -> manifest-published
    aggregate: after draining two diff batches the live version equals
    the final-snapshot recompute, a replay of the same files is a
    no-op (marker skip), and history versions are retained."""
    import os

    from etl_mudah_spark.operators.manifest import (
        manifest_publish,
        manifest_read,
    )
    from etl_mudah_spark.streaming.ingest import stream_ivm_refresh

    v1 = [(1, "a", 10.0), (2, "b", 20.0), (3, "b", 30.0)]
    v2 = [(1, "a", 15.0), (3, "c", 30.0), (4, "a", 5.0)]   # upd, migrate, ins (2 del)
    v3 = [(1, "a", 15.0), (4, "a", 7.0), (5, "b", 1.0)]    # upd, ins (3 del)
    d1, d2, d3 = (_mk(spark, v) for v in (v1, v2, v3))

    agg_base = str(tmp_path / "agg")
    manifest_publish(
        agg_base,
        lambda d: summing_agg(d1, ["grp"], {"total": "val"}).write.parquet(d),
    )

    diff_dir = str(tmp_path / "diffs")
    os.makedirs(diff_dir)
    ddl = (
        "k int, change_type string, old_grp string, new_grp string, "
        "old_val decimal(18,6), new_val decimal(18,6)"
    )
    for i, (a, b) in enumerate([(d1, d2), (d2, d3)]):
        table_diff(a, b, ["k"], compare_cols=["grp", "val"]).coalesce(
            1
        ).write.json(f"{diff_dir}/batch{i}")

    ckpt = str(tmp_path / "ckpt")
    stream_ivm_refresh(
        spark, f"{diff_dir}/batch*", ddl, agg_base, ckpt,
        group_cols=["grp"], sum_cols={"total": "val"},
    )
    want = _agg_to_dict(summing_agg(d3, ["grp"], {"total": "val"}))
    assert _agg_to_dict(manifest_read(spark, agg_base)) == want

    # replay with a FRESH checkpoint over the same files: marker skip,
    # aggregate unchanged (the double-count a naive replay would cause)
    stream_ivm_refresh(
        spark, f"{diff_dir}/batch*", ddl, agg_base, str(tmp_path / "ckpt2"),
        group_cols=["grp"], sum_cols={"total": "val"},
    )
    assert _agg_to_dict(manifest_read(spark, agg_base)) == want
