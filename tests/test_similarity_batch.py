"""batch_topk: one-pass batch retrieval vs per-probe brute force, plus
the plan claims (broadcast probe batch, salted partial window)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_mudah_spark.operators import similarity as sim
from etl_mudah_spark.tables import load
from tests.conftest import SF_SMOKE


def _probes(emb, n=5):
    return emb.where(F.col("vec_id") < n).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )


def test_batch_topk_equals_per_probe_brute(spark):
    emb = load(spark, SF_SMOKE, "embeddings")
    got = sim.batch_topk(emb, _probes(emb), k=5).collect()
    by_probe = {}
    for r in got:
        by_probe.setdefault(r["probe_id"], []).append(r)
    assert sorted(by_probe) == [0, 1, 2, 3, 4]
    for pid, rows in by_probe.items():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]
        qvec = [
            float(x)
            for x in emb.where(F.col("vec_id") == pid).first()["embedding"]
        ]
        brute = sim.brute_force_topk(
            emb.where(F.col("vec_id") != pid), qvec, k=5
        ).collect()
        assert [(r["vec_id"], r["cosine_sim"]) for r in rows] == [
            (b["vec_id"], b["cosine_sim"]) for b in brute
        ]


def test_batch_topk_rank_orders_by_similarity(spark):
    emb = load(spark, SF_SMOKE, "embeddings")
    for rows in (
        sim.batch_topk(emb, _probes(emb), k=5)
        .groupBy("probe_id")
        .agg(F.sort_array(F.collect_list(F.struct("rank", "cosine_sim"))).alias("rs"))
        .collect()
    ):
        sims = [r["cosine_sim"] for r in rows["rs"]]
        assert sims == sorted(sims, reverse=True)


def test_batch_topk_plan_broadcasts_probes_and_salts_partials(spark):
    emb = load(spark, SF_SMOKE, "embeddings")
    df = sim.batch_topk(emb, _probes(emb), k=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # probe batch is the broadcast side of the non-equi join
    assert "BroadcastNestedLoopJoin BuildRight" in plan or "BroadcastExchange" in plan
    # both windows are partitioned: stage 1 by (probe, salt), stage 2 by
    # probe over the tiny partials — nothing sorts in one task
    assert "Exchange SinglePartition" not in plan
    assert plan.count("Window") >= 2
