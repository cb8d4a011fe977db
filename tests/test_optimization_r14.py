"""Round-14 optimization pins: the plan-shape fixes stay fixed.

Each test pins an internal an optimization changed, not a result (results
are pinned by the oracle suite): the SRP bucket UDF's non-determinism
declaration (loses it -> the optimizer duplicates the Arrow matmul under
pushed filters again), the single-evaluation plan shape it buys, the
materialize-once boundaries in tfidf/shard-packing, and the fused
connected-components round.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_mudah_spark.operators import similarity as sim
from tests.conftest import SF_SMOKE


def test_srp_buckets_udf_declared_nondeterministic(spark):
    # The declaration is the whole fix (guide §4.4): deterministic pandas
    # UDFs get duplicated below pushed generate/null filters. (The spark
    # fixture is needed only because pandas_udf parses its return type
    # through the active session.)
    udf = sim.srp_buckets_udf(dim=8, n_planes=4, n_tables=3)
    assert udf.deterministic is False


def test_capped_near_dup_evaluates_bucket_udf_once_per_branch(spark):
    from etl_mudah_spark.tables import load

    df = load(spark, SF_SMOKE, "embeddings")
    q = sim.cosine_near_duplicates(
        df, threshold=0.45, target_recall=0.95, max_tables=96, dim=64,
        max_bucket_size=64,
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    n = plan.count("ArrowEvalPython")
    # 4 branches (self-join l/r + the two bucket-size aggregates), ONE
    # ArrowEvalPython each; the regression this guards reads 8.
    assert n == 4, f"expected 4 ArrowEvalPython nodes, saw {n}"


def test_tfidf_materializes_tf_once(spark):
    from etl_mudah_spark.operators import dedup as dd
    from etl_mudah_spark.tables import load

    q = dd.tfidf_cosine_pairs(
        load(spark, SF_SMOKE, "documents"), term_n=2, threshold=0.5,
        min_df=2, max_df=60,
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    # The tf boundary is an RDD scan; without it the documents scan
    # reappears once per tf consumer (12 scans in the executed x10 plan).
    assert "ExistingRDD" in plan
    assert plan.count("Scan parquet") <= 8


def test_shard_pack_global_materializes_keyed_once(spark):
    from etl_mudah_spark.plans.registry import REGISTRY

    q = REGISTRY["doc_shard_pack_global"].spark_fn(spark, SF_SMOKE)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in plan
    # one words()+md5 pass: the documents scan must not appear at all in
    # the post-checkpoint plan (both running-sum reads hit the RDD)
    assert plan.count("Scan parquet") == 0


def test_connected_components_fused_round_keeps_contract(spark):
    from etl_mudah_spark.operators.graph import connected_components

    # a 6-node chain forces multiple propagation rounds (diameter 5), so
    # the fused change-count path is exercised beyond the trivial round
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (10, 11)],
        "doc_a bigint, doc_b bigint",
    )
    out = connected_components(edges)
    # the round-internal _changed flag must not leak into the result
    assert out.columns == ["node", "component"]
    rows = {r["node"]: r["component"] for r in out.collect()}
    assert rows == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 1, 10: 10, 11: 10}


def test_packing_cum_materializes_input_once(spark):
    from etl_mudah_spark.plans.registry import REGISTRY

    q = REGISTRY["doc_shard_pack"].spark_fn(spark, SF_SMOKE)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in plan
    assert plan.count("Scan parquet") == 0
