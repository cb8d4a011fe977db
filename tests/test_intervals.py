"""Binned large×large interval join (operators/intervals.py).

Pins the three properties the strategy depends on:
- pair-set equality with the brute-force cross-join reference;
- exactly-once emission WITHOUT a distinct (a pair spanning k bins
  must meet in k bins but be emitted in exactly one);
- half-open [start, end) semantics (touching intervals don't match).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from etl_mudah_spark.operators.intervals import (
    interval_join_binned,
    interval_overlap_degree,
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "id int, start double, end double")


def _brute_pairs(rows_l, rows_r):
    out = set()
    for i, ls, le in rows_l:
        for j, rs, re_ in rows_r:
            if ls < re_ and rs < le:
                out.add((i, j))
    return out


def test_matches_bruteforce_on_random_intervals(spark):
    rng = random.Random(7)

    def gen(n):
        rows = []
        for i in range(n):
            s = rng.uniform(0, 1000)
            rows.append((i, s, s + rng.uniform(0.1, 300)))
        return rows

    left, right = gen(120), gen(90)
    got = interval_join_binned(_mk(spark, left), _mk(spark, right), bin_seconds=50)
    pairs = [(r["id"], r["id_r"]) for r in got.select("id", "id_r").collect()]
    # exactly-once: no duplicates even though intervals span many bins
    assert len(pairs) == len(set(pairs))
    assert set(pairs) == _brute_pairs(left, right)


def test_long_interval_spanning_many_bins_emitted_once(spark):
    left = [(1, 0.0, 1000.0)]  # spans 100 bins at width 10
    right = [(2, 500.0, 505.0)]
    got = interval_join_binned(_mk(spark, left), _mk(spark, right), bin_seconds=10)
    assert got.count() == 1


def test_half_open_touching_intervals_do_not_match(spark):
    left = [(1, 0.0, 10.0)]
    right = [(2, 10.0, 20.0)]  # starts exactly where left ends
    got = interval_join_binned(_mk(spark, left), _mk(spark, right), bin_seconds=4)
    assert got.count() == 0


def test_timestamp_intervals_and_extra_pred(spark):
    df = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", "2024-01-01 01:00:00"),
            (2, "2024-01-01 00:30:00", "2024-01-01 02:00:00"),
            (3, "2024-01-01 03:00:00", "2024-01-01 04:00:00"),
        ],
        "id int, start string, end string",
    ).select(
        "id",
        F.col("start").cast("timestamp").alias("start"),
        F.col("end").cast("timestamp").alias("end"),
    )
    got = interval_join_binned(
        df, df, bin_seconds=600, extra_pred=F.col("id") < F.col("id_r")
    )
    assert [(r["id"], r["id_r"]) for r in got.collect()] == [(1, 2)]


def test_overlap_degree_keeps_zero_and_excludes_self(spark):
    iv = spark.createDataFrame(
        [
            ("a", 1, 0.0, 10.0),
            ("b", 1, 5.0, 15.0),  # overlaps a1
            ("a", 2, 5.0, 9.0),  # overlaps a1 AND b1 (distinct key from a1)
            ("c", 1, 100.0, 110.0),  # overlaps nothing
        ],
        "u string, sid int, start double, end double",
    )
    deg = {
        (r["u"], r["sid"]): r["n_overlap"]
        for r in interval_overlap_degree(
            iv, bin_seconds=5, key_cols=["u", "sid"]
        ).collect()
    }
    assert deg == {("a", 1): 2, ("b", 1): 2, ("a", 2): 2, ("c", 1): 0}


def test_registered_session_concurrency_plan_has_no_cartesian(spark, sf_dir):
    from etl_mudah_spark.plans.registry import REGISTRY

    q = REGISTRY["events_session_concurrency"]
    plan = q.spark_fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


@pytest.fixture(scope="module")
def sf_dir():
    return "/root/testdata/sf0.001"


def test_hot_bin_cap_bounds_pairs_and_stats_report(spark):
    from etl_mudah_spark.operators.intervals import interval_bin_stats

    # 60 identical intervals in one bin (the planted hot bin) + a few
    # spread-out ones: uncapped ⇒ 60*59 ordered overlap pairs from the
    # hot bin; capped at 8 ⇒ at most ~(kept_l * kept_r) pairs, far
    # fewer, and never any duplicates.
    hot = [(i, 100.0, 105.0) for i in range(60)]
    cold = [(100 + i, 1000.0 * (i + 1), 1000.0 * (i + 1) + 5) for i in range(5)]
    df = _mk(spark, hot + cold)
    neq = F.col("id") != F.col("id_r")
    uncapped = interval_join_binned(df, df, bin_seconds=10, extra_pred=neq)
    assert uncapped.count() == 60 * 59
    capped = interval_join_binned(
        df, df, bin_seconds=10, extra_pred=neq, max_bin_size=8
    )
    pairs = [(r["id"], r["id_r"]) for r in capped.select("id", "id_r").collect()]
    assert len(pairs) == len(set(pairs))  # cap never introduces dupes
    assert 0 < len(pairs) < 60 * 59 / 4  # and genuinely bounds the blowup
    # determinism: same cap, same data => same kept pair set
    again = interval_join_binned(
        df, df, bin_seconds=10, extra_pred=neq, max_bin_size=8
    )
    assert set(pairs) == {
        (r["id"], r["id_r"]) for r in again.select("id", "id_r").collect()
    }

    stats = interval_bin_stats(df, df, bin_seconds=10, max_bin_size=8)
    top = stats.first()
    assert top["n_left"] == 60 and top["pair_work"] == 3600 and top["capped"]
    assert stats.where("capped").count() == 1


def test_inverted_intervals_are_guarded_out(spark):
    """Contract: start <= end. An inverted interval satisfies the raw
    overlap predicate spuriously; the guard filters it instead."""
    left = [(1, 5.0, 3.0)]   # inverted (empty set, data error)
    right = [(2, 0.0, 10.0)]
    got = interval_join_binned(_mk(spark, left), _mk(spark, right), bin_seconds=4)
    assert got.count() == 0
    # zero-length [x, x) is empty and matches nothing either
    got2 = interval_join_binned(
        _mk(spark, [(1, 5.0, 5.0)]), _mk(spark, right), bin_seconds=4
    )
    assert got2.count() == 0
