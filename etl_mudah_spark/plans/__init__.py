"""Query plan library.

Importing this package registers every declared query into
``etl_mudah_spark.plans.registry.REGISTRY``.
"""

# The driver's correctness harness records only the first 50 registered
# queries per round, so window membership is controlled EXPLICITLY via
# ``_PRIORITY`` below rather than by import-order side effects.
#
# Round 5 window (exactly 50 names): (a) the 12 queries converted this
# round from rows-only to invariant shape — their driver rows must flip
# from no_oracle to hash-green; (b) the 3 queries whose semantics
# changed (deciles de-NTILE'd, fuzzy-join block cap, idle-rich
# predicate de-vacuated) plus the new doc_decontaminate_spans; (c) the
# oldest-checked green queries — events_stream_attribution (last
# driver row: r2) and 33 of the 49 r3-checked names. The 16 r3-checked
# parity queries left for round 6 (pricing_summary, top_brands,
# brand_share, price_segments, order_year_stats, filter_stack_metrics,
# regex_and_search, distinct_priorities, similar_parts,
# priority_shares, keep_one_per_order, region_revenue, top_customers,
# top3_orders_per_customer, shipping_priority, big_orders) are exactly
# the ones the bench harness and tests/test_oracle.py execute against
# their oracles every run anyway — with 100+ registered queries and a
# 50-row window, full rotation takes two rounds and these have the
# strongest out-of-window coverage.
#
# Round-6 window should take: the 16 parity names above, the sixteen
# late-round-5 additions (ann_batch_topk, events_stream_sessions_native,
# doc_bm25_search, returned_item_customers, part_profit_by_nation_year,
# emb_pca_variance, doc_repeated_spans, doc_token_budget_mix,
# events_stream_unconverted, vocab_zipf_fit, doc_unigram_surprisal,
# doc_media_features, ann_filtered_topk, doc_hybrid_rrf,
# join_key_skew_profile, doc_excise_repeated_spans — never
# driver-rowed), and the remaining r3/r4-checked tail; all 126 are
# sim-checked at sf0.01 AND sf0.1 regardless (scripts/driver_sim.py,
# SPARK_GRAFT_SF_DIR_CORRECT).
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
    # (a) round-5 conversions: rows-only -> invariant shape; these rows
    # must flip from no_oracle to hash-green in CORRECTNESS_r05
    "events_user_hll",
    "events_value_quantiles",
    "vocab_cms_topk",
    "doc_minhash_near_dup",
    "doc_simhash_near_dup",
    "doc_dup_clusters",
    "doc_minhash_incremental",
    "emb_cosine_near_dup_lsh",
    "ann_srp_topk",
    "ann_pq_topk",
    "price_model_r2",
    "doc_quality_model",
    # (b) round-5 semantic changes + the new span query
    "customer_balance_deciles",
    "part_name_fuzzy_pairs",
    "idle_rich_customers_by_nation",
    "doc_decontaminate_spans",
    # (c) oldest driver rows first: r2 ...
    "events_stream_attribution",
    # ... then the r3-checked families (starjoins/llmprep/profile/geoq/
    # temporal + parity tail), 33 of 49
    "qty_price_corr",
    "brand_quartiles",
    "price_bins",
    "nation_customer_stats",
    "share_above_avg",
    "running_customer_revenue",
    "orders_pivot_status",
    "rollup_region_nation",
    "customers_without_orders",
    "late_shipment_priority",
    "promo_revenue_by_month",
    "cheapest_supplier_per_part",
    "small_qty_part_revenue",
    "nation_market_share",
    "nation_acctbal_concentration",
    "top_supplier_by_revenue",
    "brand_type_supplier_counts",
    "disjunctive_join_revenue",
    "customers_retained",
    "customers_churned",
    "salted_event_totals",
    "doc_chunks",
    "vocab_topk",
    "term_idf_top20",
    "lineitem_unpivot_metrics",
    "lineitem_profile",
    "price_kde",
    "state_market_stats",
    "events_asof_last_view",
    "events_promo_range_join",
    "daily_revenue_moving_avg",
    "orders_cube_status_priority",
    "ann_ivf_topk",
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
