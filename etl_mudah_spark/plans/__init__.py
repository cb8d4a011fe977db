"""Query plan library.

Importing this package registers every declared query into
``etl_mudah_spark.plans.registry.REGISTRY``.
"""

# The driver's correctness harness records only the first 50 registered
# queries per round, so window membership is controlled EXPLICITLY via
# ``_PRIORITY`` below rather than by import-order side effects.
#
# Rotation history: r5 flipped the 12 invariant-shape conversions + 34
# oldest r2/r3 rows (CORRECTNESS_r05 50/50); r6 completed the rotation
# (50/50); r7 covered the 30 r4-checked names + the 11 r7 additions +
# r5 fills (CORRECTNESS_r07 50/50). The round-8 window below finishes
# the cycle: the 43 names whose newest driver row is r4/r5 plus the 7
# round-8 additions — after this round every registered query's newest
# driver row is r6+. Round-9 should rotate to the then-oldest r6 rows
# (alphabetically-first of the 50 CORRECTNESS_r06 names) plus any
# round-9 additions AND the queries registered after this round's
# window was frozen at 50 (twenty so far): lineitem_zone_pruned_revenue,
# orders_hll_distinct, doc_stratified_sample,
# supplier_customer_pagerank, doc_tfidf_similar, doc_dup_triangles,
# lineitem_bloom_semijoin, part_brand_target_encoding,
# orders_cms_heavy_customers, events_markov_transitions,
# customer_balance_neighbors, part_price_size_frontier,
# priority_customer_overlap, events_stream_cms_users,
# orders_replica_diff, events_value_winsorized,
# daily_revenue_changepoint, orders_dow_seasonality,
# customer_shard_routing, part_brand_type_mi. All registered queries
# are additionally sim-checked at sf0.01 AND sf0.1 every round
# regardless (scripts/driver_sim.py; round-8 final: 171 registered,
# 171 with oracles — zero rows-only).
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
    # Round-8 window (exactly 50 names), executing the rotation
    # planned in the r7 comment above: (a) the 43 names whose newest
    # driver row is round 5 or older -- after this round no
    # registered query's newest driver row is older than round 6;
    # (b) the 7 round-8 additions (prefix-filtered exact Jaccard,
    # weighted sampling, bigram PMI, basket lift, daily EWMA, key-skew
    # report, erasure-cascade audit). All registered queries remain
    # sim-checked at sf0.01 and sf0.1 every round regardless
    # (scripts/driver_sim.py).
    # --- (a) names whose newest driver row is r4/r5 ---
    "brand_type_supplier_counts",
    "cheapest_supplier_per_part",
    "customers_churned",
    "customers_retained",
    "customers_without_orders",
    "doc_chunks",
    "doc_decontaminate_spans",
    "doc_dup_clusters",
    "doc_minhash_incremental",
    "doc_minhash_near_dup",
    "doc_quality_model",
    "doc_simhash_near_dup",
    "emb_cosine_near_dup_lsh",
    "events_asof_last_view",
    "events_promo_range_join",
    "events_stream_attribution",
    "events_user_hll",
    "events_value_quantiles",
    "idle_rich_customers_by_nation",
    "late_shipment_priority",
    "lineitem_profile",
    "lineitem_unpivot_metrics",
    "nation_acctbal_concentration",
    "nation_customer_stats",
    "nation_market_share",
    "orders_cube_status_priority",
    "orders_pivot_status",
    "part_name_fuzzy_pairs",
    "price_bins",
    "price_kde",
    "price_model_r2",
    "promo_revenue_by_month",
    "qty_price_corr",
    "rollup_region_nation",
    "running_customer_revenue",
    "salted_event_totals",
    "share_above_avg",
    "small_qty_part_revenue",
    "state_market_stats",
    "term_idf_top20",
    "top_supplier_by_revenue",
    "vocab_cms_topk",
    "vocab_topk",
    # --- (b) new in round 8 ---
    "doc_prefix_jaccard",
    "doc_weighted_sample",
    "doc_bigram_pmi",
    "part_basket_lift",
    "events_daily_ewma",
    "events_key_skew",
    "customer_erasure_audit",
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
