"""Behavioral tests for the as-of join operator and IVF ANN recall.

(The temporal queries' value correctness is pinned by the auto-
discovered DuckDB oracles in test_oracle.py; these tests pin the edge
semantics an oracle diff can't localize.)
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from etl_mudah_spark.operators.asof import asof_join_backward
from etl_mudah_spark.operators.similarity import brute_force_topk, ivf_topk
from etl_mudah_spark.tables import load
from tests.conftest import SF_SMOKE


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


def test_ivf_topk_recall_vs_brute_force(spark):
    emb = load(spark, SF_SMOKE, "embeddings")
    q = [float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    exact = [r["vec_id"] for r in brute_force_topk(emb, q, k=10).collect()]
    approx = [r["vec_id"] for r in ivf_topk(emb, q, k=10, n_cells=8, n_probe=4).collect()]
    # The query vector itself must always survive cell pruning, and the
    # probe set should keep a reasonable share of true neighbors.
    assert approx[0] == 0
    assert len(set(exact) & set(approx)) >= 5
