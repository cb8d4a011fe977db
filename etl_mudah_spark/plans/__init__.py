"""Query plan library.

Importing this package registers every declared query into
``etl_mudah_spark.plans.registry.REGISTRY``.
"""

# The driver's correctness harness records only the first 50 registered
# queries per round, so window membership is controlled EXPLICITLY via
# ``_PRIORITY`` below rather than by import-order side effects. Round 4
# front-loads: the round-3 red row (emb_label_centroids, reshaped to
# scalar long form), every query that has never had a driver row (all
# round-4 additions), and the queries displaced from the r3 window
# (parity tail + the datapipe/eventsq families). The priority list is
# 51 names, so its last entry (events_stream_attribution — r2-green,
# oracle identical to the in-window events_attribution, pytest-pinned)
# sits just outside the window; everything else displaced
# (starjoins/llmprep/profile/geoq/temporal) is r3-green and stays
# covered by the identical DuckDB-oracle comparison in
# tests/test_oracle.py.
from etl_mudah_spark.plans import registry  # noqa: F401
from etl_mudah_spark.plans import parity  # noqa: F401
from etl_mudah_spark.plans import datapipe  # noqa: F401
from etl_mudah_spark.plans import eventsq  # noqa: F401
from etl_mudah_spark.plans import starjoins  # noqa: F401
from etl_mudah_spark.plans import llmprep  # noqa: F401
from etl_mudah_spark.plans import profile  # noqa: F401
from etl_mudah_spark.plans import geoq  # noqa: F401
from etl_mudah_spark.plans import temporal  # noqa: F401
from etl_mudah_spark.plans import mlq  # noqa: F401

_PRIORITY = [
    # never-green / never-checked first
    "emb_label_centroids",
    "price_model_r2",
    "doc_dup_clusters",
    # new in round 4: split/packing, repetition filter, incremental
    # dedup, decontamination, domain mixing, PII scrub, composed pipeline
    "doc_train_split",
    "doc_shard_pack",
    "doc_repetition_scores",
    "doc_minhash_incremental",
    "doc_decontaminate",
    "doc_domain_mix",
    "doc_pii_scrub",
    "doc_clean_pipeline",
    # new in round 4 (session 2): chunk-level dedup, global shuffle,
    # funnel, PQ ANN
    "doc_chunk_dedup",
    "doc_global_shuffle",
    "events_funnel",
    "events_retention",
    "ann_pq_topk",
    "doc_quality_model",
    "vocab_cms_topk",
    "events_anomaly",
    "waiting_sole_late_supplier",
    "idle_rich_customers_by_nation",
    "part_name_fuzzy_pairs",
    "events_hourly_dense",
    "customer_balance_deciles",
    "orders_per_customer_dist",
    "parts_pareto_80",
    # parity tail displaced from the r3 window
    "monthly_order_volume",
    "customer_order_links",
    # datapipe family (r1/r2-green, displaced in r3)
    "doc_token_stats",
    "doc_quality",
    "doc_lang_guess",
    "doc_fingerprint",
    "doc_exact_dedup",
    "doc_ngram_jaccard",
    "doc_minhash_near_dup",
    "doc_simhash_near_dup",
    "emb_norm_stats",
    "ann_bruteforce_topk",
    "ann_srp_topk",
    "emb_cosine_near_dup",
    "emb_cosine_near_dup_lsh",
    # eventsq family (r1/r2-green, displaced in r3)
    "events_hourly",
    "events_stream_hourly",
    "events_stream_dedup",
    "events_json_stats",
    "events_sessionize",
    "events_stream_sessions",
    "events_user_hll",
    "events_value_quantiles",
    "events_attribution",
    "events_stream_attribution",
]


def _reorder() -> None:
    """Rebuild REGISTRY with ``_PRIORITY`` names first (their relative
    order preserved), everything else in registration order."""
    missing = [n for n in _PRIORITY if n not in registry.REGISTRY]
    if missing:
        raise RuntimeError(f"_PRIORITY names not registered: {missing}")
    ordered = {n: registry.REGISTRY[n] for n in _PRIORITY}
    ordered.update(
        {n: q for n, q in registry.REGISTRY.items() if n not in ordered}
    )
    registry.REGISTRY.clear()
    registry.REGISTRY.update(ordered)


_reorder()

__all__ = [
    "registry",
    "parity",
    "datapipe",
    "eventsq",
    "starjoins",
    "llmprep",
    "profile",
    "geoq",
    "temporal",
    "mlq",
]
