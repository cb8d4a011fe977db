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
# r5 fills (CORRECTNESS_r07 50/50); r8 covered the 43 r4/r5-stale
# names + the 7 round-8 additions (CORRECTNESS_r08 50/50) — after r8
# every query REGISTERED AT THE FREEZE has a driver row of r6+. The
# round-9 window below picks up (a) the 21 queries registered after
# the r8 freeze (never driver-rowed), (b) the 10 round-9 additions,
# and (c) the 19 alphabetically-first r6-stale names. All registered
# queries are additionally sim-checked at sf0.01 AND sf0.1 every
# round regardless (scripts/driver_sim.py; round-9 final: 214
# registered, 214 with oracles — zero rows-only; the late round-9
# additions — events_stream_drift_psi, doc_lang_kappa,
# doc_novelty_scores, customer_revenue_gini, daily_revenue_theilsen,
# supplier_ppr_topk, events_seasonal_backtest, the exact_dedup
# agg rewrite, and the continuation batches (events_value_ks_drift,
# doc_quality_pr_curve, doc_quality_avg_precision, doc_quality_brier,
# priority_monthly_trend_ols, flag_weighted_price_quartiles,
# events_conformal_interval, part_golden_records, part_fd_audit,
# events_stream_ks_binned, customer_k_anonymity,
# events_value_mad_outliers, events_value_quantile_rollup,
# doc_cluster_modularity, doc_readability,
# events_stream_quantile_sketch, events_sliding_5min_peak,
# events_stream_sliding_peak, events_type_quantile_norm,
# customer_km_survival, segment_churn_logrank, events_ab_test,
# customer_rfm_segments, events_position_attribution,
# customer_revenue_lorenz, events_daily_growth_accounting) —
# stay OUT of the frozen window and
# lead the round-10 never-rowed list).
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

# The round this window was rotated FOR. The rotation guard
# (tests/test_correctness_rotation.py) checks staleness against the
# CORRECTNESS records that existed at this window's freeze (rounds
# < _WINDOW_ROUND), so the guard stays green after the driver writes
# CORRECTNESS_r{_WINDOW_ROUND}.json and goes red only if a LATER
# round runs without a rotation — fixing the r10 lifecycle flaw where
# the guard was red for half of every round by construction.
_WINDOW_ROUND = 13

_PRIORITY = [
    # Round-13 window (exactly 50 names):
    # (a) the 22 remaining r8-stale names (nation_acctbal_concentration
    #     onward alphabetically) — after this round, no driver row is
    #     older than r9;
    # (b) round-13 additions (never driver-rowed), if any — they
    #     displace the alphabetically-last fillers in (c);
    # (c) alphabetically-first r9-stale names filling the remainder.
    #     Round-14 should resume the r9-stale names at
    #     doc_quality onward (doc_quality_auc, doc_quality_calibration,
    #     doc_repeated_spans next).
    # Window discipline is MACHINE-CHECKED by
    # tests/test_correctness_rotation.py. All registered queries are
    # additionally sim-checked at sf0.01 every round regardless
    # (scripts/driver_sim.py).
    # --- (a) the 22 r8-stale names ---
    "nation_acctbal_concentration",
    "nation_customer_stats",
    "nation_market_share",
    "orders_cube_status_priority",
    "orders_pivot_status",
    "part_basket_lift",
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
    # --- (b) new in round 13 (never driver-rowed) ---
    "emb_hard_negatives",
    "emb_knn_label_agreement",
    "emb_label_separation",
    "source_overlap_matrix",
    # --- (c) stalest r9 rows, alphabetically first ---
    "ann_batch_topk",
    "ann_filtered_indexed",
    "ann_filtered_topk",
    "ann_ivfpq_filtered_topk",
    "ann_pq_filtered_topk",
    "big_orders",
    "brand_price_regression",
    "brand_share",
    "customer_balance_neighbors",
    "customer_order_links",
    "customer_priority_scd2",
    "customer_shard_routing",
    "daily_revenue_changepoint",
    "distinct_priorities",
    "doc_bm25_search",
    "doc_bpe_token_stats",
    "doc_containment_pairs",
    "doc_dedup_keep_best",
    "doc_dup_triangles",
    "doc_excise_repeated_spans",
    "doc_hybrid_rrf",
    "doc_keyness_g2",
    "doc_lang_guess",
    "doc_media_features",
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
