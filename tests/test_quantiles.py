"""Weighted-quantile pins (operators/quantiles.py): hand-computed
lower weighted quantiles on tiny frames, the unweighted degenerate
case, null handling, and the grouped prefix-sum's agreement with a
plain per-group window."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_mudah_spark.operators.quantiles import (
    grouped_bucketed_running_sum,
    weighted_quantiles_exact,
)


def _wq(spark, rows, quantiles=((1, 2),)):
    df = spark.createDataFrame(rows, "g string, v double, w long")
    out = weighted_quantiles_exact(df, ["g"], "v", "w", quantiles=quantiles)
    return {r.g: r for r in out.collect()}


def test_weighted_median_shifts_with_weight(spark):
    # Unweighted median of {1,2,3} is 2; piling weight on 3 moves it.
    rows = [("a", 1.0, 1), ("a", 2.0, 1), ("a", 3.0, 10)]
    r = _wq(spark, rows)["a"]
    assert r.total_weight == 12 and r.n_rows == 3
    # cum: 1->1, 2->2, 3->12; first v with 2*cum >= 12 is 3.
    assert r.q_1_2 == 3.0


def test_uniform_weights_match_lower_median(spark):
    rows = [("a", 10.0, 1), ("a", 20.0, 1), ("a", 30.0, 1), ("a", 40.0, 1)]
    r = _wq(spark, rows)["a"]
    # 2*cum >= 4 first at v=20 (cum=2): the LOWER median convention.
    assert r.q_1_2 == 20.0


def test_quartiles_and_duplicate_values_merge(spark):
    rows = [("a", 1.0, 2), ("a", 1.0, 2), ("a", 2.0, 4), ("a", 3.0, 8)]
    r = _wq(spark, rows, quantiles=((1, 4), (1, 2), (3, 4)))["a"]
    assert r.total_weight == 16 and r.n_rows == 4
    # cum: 1->4, 2->8, 3->16.
    assert r.q_1_4 == 1.0  # 4*4 >= 16
    assert r.q_1_2 == 2.0  # 2*8 >= 16
    assert r.q_3_4 == 3.0  # 4*16 >= 48
    # q = 1 (the max) returns the max value.
    full = _wq(spark, rows, quantiles=((1, 1),))["a"]
    assert full.q_1_1 == 3.0


def test_groups_independent_and_nulls_excluded(spark):
    rows = [
        ("a", 1.0, 1),
        ("a", 9.0, 1),
        ("b", 5.0, 3),
        ("b", None, 7),
        ("b", 6.0, None),
    ]
    out = _wq(spark, rows)
    assert out["a"].q_1_2 == 1.0 and out["a"].total_weight == 2
    assert out["b"].q_1_2 == 5.0
    assert out["b"].total_weight == 3 and out["b"].n_rows == 1


def test_bad_quantile_rejected(spark):
    df = spark.createDataFrame([("a", 1.0, 1)], "g string, v double, w long")
    with pytest.raises(ValueError):
        weighted_quantiles_exact(df, ["g"], "v", "w", quantiles=((0, 4),))
    with pytest.raises(ValueError):
        weighted_quantiles_exact(df, ["g"], "v", "w", quantiles=((5, 4),))


def test_grouped_running_sum_matches_plain_window(spark):
    rows = [
        (g, float(v), v * 2 + 1)
        for g in ("x", "y")
        for v in range(1, 40)
    ]
    df = spark.createDataFrame(rows, "g string, v double, w long")
    got = grouped_bucketed_running_sum(
        df,
        ["g"],
        bucket=F.floor(F.col("v") / 10).cast("bigint"),
        order_cols=[F.col("v")],
        val=F.col("w").cast("decimal(38,6)"),
        sum_col="cum",
    )
    w = (
        Window.partitionBy("g")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = df.withColumn("cum", F.sum(F.col("w").cast("decimal(38,6)")).over(w))
    lhs = {(r.g, r.v): int(r.cum) for r in got.collect()}
    rhs = {(r.g, r.v): int(r.cum) for r in want.collect()}
    assert lhs == rhs
