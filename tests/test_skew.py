"""Skew operators must be pure rewrites: salted plans == unsalted plans."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_mudah_spark.operators.skew import salted_join, salted_sum_count
from etl_mudah_spark.tables import load


def test_salted_sum_count_matches_plain_groupby(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    plain = {
        r["event_type"]: (r["s"], r["c"])
        for r in ev.groupBy("event_type")
        .agg(
            F.sum(F.col("value").cast("decimal(28,6)")).cast("double").alias("s"),
            F.count("value").alias("c"),
        )
        .collect()
    }
    salted = {
        r["event_type"]: (r["sum_value"], r["cnt"])
        for r in salted_sum_count(
            ev, ["event_type"], "value", n_salts=8, salt_from="event_id"
        ).collect()
    }
    assert salted == plain  # bit-identical: exact decimal partials


def test_salted_sum_count_invariant_to_salt_count(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    a = sorted(
        map(tuple, salted_sum_count(ev, ["event_type"], "value", n_salts=2).collect())
    )
    b = sorted(
        map(tuple, salted_sum_count(ev, ["event_type"], "value", n_salts=32).collect())
    )
    assert a == b


def test_salted_join_matches_plain_join(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity").limit(2000)
    orders = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    plain = (
        li.join(orders, "l_orderkey")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    salted = (
        salted_join(li, orders, on="l_orderkey", n_salts=4)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
