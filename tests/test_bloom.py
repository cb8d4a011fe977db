"""Bloom semi-join reduction (operators/bloom.py): the no-false-
negative contract, the false-positive envelope, exactness of the
composed semi-join, and the plan shape (broadcast probes only — no
fact-side exchange before the prune)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_mudah_spark.operators.bloom import (
    bloom_build,
    bloom_prune,
    bloom_semi_join,
)


@pytest.fixture(scope="module")
def members(spark):
    return spark.range(0, 1000).select((F.col("id") * 7 + 3).alias("k"))


def test_bloom_no_false_negatives(spark, members):
    """Every built key passes the probe — for several k and sizes,
    including an undersized filter where false positives abound."""
    for n_bits, k in ((1 << 14, 3), (1 << 10, 5), (1 << 8, 1)):
        bloom = bloom_build(members, "k", n_bits=n_bits, k=k)
        kept = bloom_prune(members, "k", bloom, n_bits=n_bits, k=k)
        assert kept.count() == 1000, (n_bits, k)


def test_bloom_false_positive_rate_bounded(spark, members):
    """Non-members pass at ~(1 - e^{-kn/m})^k: 1000 keys in 2^14 bits
    at k=3 predicts fpp ≈ 0.45%; assert an order-of-magnitude cap."""
    bloom = bloom_build(members, "k", n_bits=1 << 14, k=3)
    non_members = spark.range(0, 20_000).select(
        (F.col("id") * 7 + 4).alias("k")  # offset 4: disjoint from 7i+3
    )
    fp = bloom_prune(non_members, "k", bloom, n_bits=1 << 14, k=3).count()
    assert fp / 20_000 < 0.03, fp


def test_bloom_semi_join_equals_left_semi(spark):
    fact = spark.range(0, 5000).select(
        (F.col("id") % 700).alias("fk"), F.col("id").alias("payload")
    )
    dim = spark.range(0, 5000).select((F.col("id") * 13 % 700).alias("dk")).where(
        F.col("dk") % 5 == 2
    )
    got = bloom_semi_join(fact, "fk", dim, "dk", n_bits=1 << 12, k=3)
    want = fact.join(
        dim.select(F.col("dk")).distinct(), fact.fk == F.col("dk"), "left_semi"
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_bloom_prune_plan_is_broadcast_only(spark, members):
    """The pruned fact plan contains k BroadcastHashJoins and NO
    fact-side shuffle: the only Exchanges in the whole plan belong to
    the bitmap build side (pre-broadcast aggregation), so pruning adds
    zero exchanges to the fact lineage."""
    fact = spark.range(0, 1000).select(F.col("id").alias("k"))
    bloom = bloom_build(members, "k", n_bits=1 << 12, k=3)
    plan = bloom_prune(fact, "k", bloom, n_bits=1 << 12, k=3)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 3
    # every Exchange feeds a BroadcastExchange (bitmap build), never the
    # fact side: the fact scan (spark.range) reaches the first join
    # without an exchange.
    import re

    assert not re.search(r"Exchange hashpartitioning\(k#", plan), plan
