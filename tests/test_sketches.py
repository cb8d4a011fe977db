"""Tolerance pins for the sketch-based approximate queries (HLL
cardinality, GK quantiles) and the inverted-index frequency cutoff —
the operators whose value at 100 TB is bounded memory + mergeability,
verified here against their exact twins at test scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_mudah_spark.operators.dedup import ngram_jaccard_pairs
from etl_mudah_spark.plans import registry
from etl_mudah_spark.tables import load
from tests.conftest import SF_CORRECT, SF_SMOKE


def test_hll_estimates_within_tolerance(spark):
    got = {
        r["event_type"]: r["approx_users"]
        for r in registry.REGISTRY["events_user_hll"].spark_fn(spark, SF_CORRECT).collect()
    }
    events = load(spark, SF_CORRECT, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    exact["__all__"] = events.select("user_id").distinct().count()
    assert set(got) == set(exact)
    for k, est in got.items():
        # default HLL lgConfigK=12 => relative standard error ~1.6%;
        # 5% is a generous multiple of that
        assert abs(est - exact[k]) / exact[k] < 0.05, (k, est, exact[k])


def test_hll_union_consistent_with_member_sketches(spark):
    """The rolled-up estimate must cover at least the largest member
    (union can only grow a cardinality)."""
    rows = registry.REGISTRY["events_user_hll"].spark_fn(spark, SF_CORRECT).collect()
    per_type = [r["approx_users"] for r in rows if r["event_type"] != "__all__"]
    total = [r["approx_users"] for r in rows if r["event_type"] == "__all__"][0]
    assert total >= max(per_type)
    assert total <= sum(per_type) * 1.05  # and no wild overcount


def test_quantile_sketch_within_tolerance(spark):
    got = {
        r["event_type"]: (r["p50"], r["p95"], r["p99"])
        for r in registry.REGISTRY["events_value_quantiles"]
        .spark_fn(spark, SF_CORRECT)
        .collect()
    }
    events = load(spark, SF_CORRECT, "events")
    exact = {
        r["event_type"]: r["qs"]
        for r in events.groupBy("event_type")
        .agg(F.expr("percentile(value, array(0.5, 0.95, 0.99))").alias("qs"))
        .collect()
    }
    for k, (p50, p95, p99) in got.items():
        for est, true in zip((p50, p95, p99), exact[k]):
            assert abs(est - true) / max(abs(true), 1e-9) < 0.05, (k, est, true)


def test_ngram_frequency_cutoff_prunes_but_preserves(spark):
    docs = load(spark, SF_SMOKE, "documents")
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    # generous cap: nothing should be lost
    capped = {
        (r["doc_a"], r["doc_b"])
        for r in ngram_jaccard_pairs(docs, threshold=0.5, max_shingle_df=10_000).collect()
    }
    assert capped == exact
    # aggressive cap: strictly a subset (jaccard is a lower bound)
    tight = {
        (r["doc_a"], r["doc_b"])
        for r in ngram_jaccard_pairs(docs, threshold=0.5, max_shingle_df=2).collect()
    }
    assert tight <= exact


def test_cms_bounds(spark):
    """Count-min sketch: est >= exact always; est <= exact + eps*N with
    prob >= confidence (all 10 rows, generous at this N)."""
    from etl_mudah_spark.operators import text as tx
    from etl_mudah_spark.plans.llmprep import CMS_EPS

    rows = registry.REGISTRY["vocab_cms_topk"].spark_fn(spark, SF_CORRECT).collect()
    assert len(rows) == 10
    n_terms = (
        load(spark, SF_CORRECT, "documents")
        .select(F.explode(tx.words("text")).alias("t"))
        .count()
    )
    for r in rows:
        assert r["cms_est"] >= r["exact_cnt"], "CMS must never underestimate"
        assert r["cms_est"] <= r["exact_cnt"] + CMS_EPS * n_terms
