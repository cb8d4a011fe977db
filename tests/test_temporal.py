"""Behavioral tests for the as-of join operator.

(The temporal queries' value correctness is pinned by the auto-
discovered DuckDB oracles in test_oracle.py; these tests pin the edge
semantics an oracle diff can't localize. IVF ANN recall lives in
tests/test_similarity_ivf.py.)
"""

from __future__ import annotations

from datetime import datetime

from etl_mudah_spark.operators.asof import asof_join_backward


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def test_asof_backward_semantics(spark):
    trades = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01 10:00:00")),   # before any quote -> null
            (2, "u1", _ts("2024-01-01 11:00:00")),   # exactly at quote q1 -> inclusive
            (3, "u1", _ts("2024-01-01 12:30:00")),   # between q2 and q3 -> q2
            (4, "u2", _ts("2024-01-01 12:00:00")),   # other key -> that key's quote only
        ],
        "trade_id int, user string, ts timestamp",
    )
    quotes = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01 11:00:00"), 10.0),  # q1
            ("u1", _ts("2024-01-01 12:00:00"), 20.0),  # q2
            ("u1", _ts("2024-01-01 13:00:00"), 30.0),  # q3
            ("u2", _ts("2024-01-01 09:00:00"), 99.0),
        ],
        "user string, ts timestamp, px double",
    )
    out = {
        r["trade_id"]: r["px_asof"]
        for r in asof_join_backward(
            trades, quotes, ["user"], "ts", "ts", ["px"]
        ).collect()
    }
    assert out == {1: None, 2: 10.0, 3: 20.0, 4: 99.0}


def test_asof_keeps_all_left_rows_and_columns(spark):
    left = spark.createDataFrame(
        [(1, "k", _ts("2024-01-01 00:00:00"), "payload")],
        "id int, k string, ts timestamp, extra string",
    )
    right = spark.createDataFrame([], "k string, ts timestamp, v double")
    rows = asof_join_backward(left, right, ["k"], "ts", "ts", ["v"]).collect()
    assert len(rows) == 1
    assert rows[0]["extra"] == "payload" and rows[0]["v_asof"] is None


def test_theilsen_registered_query_is_outlier_robust(spark):
    """Sanity on the estimator itself (the registered query's oracle
    parity is covered by test_oracle): the median pairwise slope of a
    clean linear series equals the true slope exactly, and one
    corrupted point leaves it unchanged."""
    from pyspark.sql import functions as F

    def theil_sen(rows):
        df = spark.createDataFrame(rows, "t int, x double")
        a = df.select(F.col("t").alias("ta"), F.col("x").alias("xa"))
        b = df.select(F.col("t").alias("tb"), F.col("x").alias("xb"))
        return (
            a.join(b, F.col("tb") > F.col("ta"))
            .select(
                ((F.col("xb") - F.col("xa")) / (F.col("tb") - F.col("ta"))).alias("s")
            )
            .agg(F.median("s"))
            .first()[0]
        )

    clean = [(t, 10.0 + 2.0 * t) for t in range(1, 12)]
    assert theil_sen(clean) == 2.0
    corrupted = clean[:5] + [(6, 1e6)] + clean[6:]
    assert theil_sen(corrupted) == 2.0  # breakdown point not reached
