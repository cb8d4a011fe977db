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


def test_token_count_equals_regexp_count_form_adversarially(spark):
    # MEASURED-REJECTED twin, equality kept pinned (round 14): the
    # allocation-free `regexp_count(trim, '\s+') + 1` form of
    # token_count was A/B'd on the x100 documents staging and was NO
    # faster, so token_count stays size(split). The equivalence proof
    # stays here so a future re-attempt starts from it: split(limit=-1)
    # keeps empty pieces, so pieces == separator matches + 1 on EVERY
    # non-null string — empties, all-whitespace, and non-space
    # whitespace that trim() (space only) does not strip.
    import random

    from etl_mudah_spark.operators import text as tx

    cases = [
        "", " ", "  ", "\t", "\n", " \t \n ", "a", " a ", "a b",
        "a  b", "\ta b\n", "a\tb\nc", "word", "x " * 500, "\t\t\t",
        "\na", "a\n", " \ta", "a\t ", "tab\tsep\tvals", "a\x0bb",
    ]
    rng = random.Random(1414)
    alphabet = "ab .\t\nxy"
    cases += [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 80)))
        for _ in range(300)
    ]
    df = spark.createDataFrame([(s,) for s in cases], "text string")
    t = F.trim("text")
    regexp_form = F.regexp_count(t, F.lit(tx.WHITESPACE_RE)) + F.lit(1)
    bad = (
        df.select(regexp_form.alias("o"), tx.token_count("text").alias("n"))
        .where(~F.col("o").eqNullSafe(F.col("n")))
        .count()
    )
    assert bad == 0


def test_binary_md5_key_orders_like_hex(spark):
    # MEASURED-REJECTED twin, order-equivalence kept pinned (round 14):
    # sorting doc_shard_pack_global's _ok as unhex(md5) BYTES is
    # order-identical to the hex string but measured no faster, so the
    # plan keeps hex. The invariants a re-attempt needs: (1) Spark
    # compares BinaryType UNSIGNED — 0x7f sorts before 0x80; (2) ORDER
    # BY (binary key, id) and the 1-byte-prefix bucket-major order
    # reproduce the hex-string order row for row.
    lo_hi = spark.sql(
        "SELECT id FROM VALUES (unhex('80'), 0), (unhex('7f'), 1) t(b, id) "
        "ORDER BY b"
    ).collect()
    assert [r["id"] for r in lo_hi] == [1, 0], "BinaryType must sort unsigned"

    df = spark.range(5000).select(
        F.col("id"), F.md5(F.col("id").cast("string")).alias("ok")
    ).select("id", "ok", F.unhex("ok").alias("okb"))
    by_hex = [r["id"] for r in df.orderBy("ok", "id").collect()]
    by_bin = [r["id"] for r in df.orderBy("okb", "id").collect()]
    by_bucket_major = [
        r["id"]
        for r in df.orderBy(
            F.substring("okb", 1, 1), F.col("okb"), F.col("id")
        ).collect()
    ]
    assert by_bin == by_hex
    assert by_bucket_major == by_hex
