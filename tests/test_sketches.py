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
    """The round-5 invariant row: exact distinct counts (the DuckDB-
    checkable twin) plus the hll_ok boolean asserting the sketch
    estimate lands within HLL_REL_ERR (5% — a generous multiple of the
    default lgConfigK=12 RSE of ~1.6%)."""
    rows = registry.REGISTRY["events_user_hll"].spark_fn(spark, SF_CORRECT).collect()
    got = {r["event_type"]: r for r in rows}
    events = load(spark, SF_CORRECT, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    exact["__all__"] = events.select("user_id").distinct().count()
    assert set(got) == set(exact)
    for k, r in got.items():
        assert r["exact_users"] == exact[k], (k, r)
        assert r["hll_ok"], f"HLL estimate outside 5% band for {k}"


def test_hll_union_consistent_with_member_sketches(spark):
    """The rolled-up row must be a true union: global distinct count is
    bounded by the per-type counts (union can only grow a cardinality,
    never beyond the sum), and its sketch estimate passes the band."""
    rows = registry.REGISTRY["events_user_hll"].spark_fn(spark, SF_CORRECT).collect()
    per_type = [r["exact_users"] for r in rows if r["event_type"] != "__all__"]
    total_row = [r for r in rows if r["event_type"] == "__all__"][0]
    assert total_row["exact_users"] >= max(per_type)
    assert total_row["exact_users"] <= sum(per_type)
    assert total_row["hll_ok"]


def test_quantile_sketch_within_tolerance(spark):
    """p50/p95/p99 are now the exact percentiles (the oracle-checkable
    twin); approx_ok asserts the GK sketch landed inside the ±0.01 rank
    band around each."""
    got = {
        r["event_type"]: r
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
    for k, r in got.items():
        for got_p, true in zip((r["p50"], r["p95"], r["p99"]), exact[k]):
            assert got_p == round(true, 4), (k, got_p, true)
        assert r["approx_ok"], f"approx percentile outside rank band for {k}"


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
    """Count-min sketch invariant row: exact top-10 counts (descending,
    term-asc tiebreak — the oracle-checkable twin) with cms_ok
    asserting est >= exact and est <= exact + 2*eps*N for every row."""
    rows = registry.REGISTRY["vocab_cms_topk"].spark_fn(spark, SF_CORRECT).collect()
    assert len(rows) == 10
    counts = [r["exact_cnt"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(c > 0 for c in counts)
    for r in rows:
        assert r["cms_ok"], f"CMS estimate outside band for {r['term']}"
