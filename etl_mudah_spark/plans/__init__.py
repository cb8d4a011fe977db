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
_WINDOW_ROUND = 12

_PRIORITY = [
    # Round-12 window (exactly 50 names):
    # (a) the 21 remaining r7-stale names (events_funnel, then
    #     events_hourly onward alphabetically) — after this round, no
    #     driver row is older than r8;
    # (b) round-12 additions (never driver-rowed), if any — they
    #     displace the alphabetically-last fillers in (c);
    # (c) alphabetically-first r8-stale names filling the remainder.
    #     Round-13 should resume the r8-stale names at
    #     nation_acctbal_concentration, then nation_customer_stats
    #     onward.
    # Window discipline is MACHINE-CHECKED by
    # tests/test_correctness_rotation.py: never-rowed queries must all
    # sit in the window, and the filler slots must go to the stalest
    # recorded names — the rotation can no longer be silently missed.
    # All registered queries are additionally sim-checked at sf0.01
    # every round regardless (scripts/driver_sim.py).
    # --- (a) the 21 r7-stale names ---
    "events_funnel",
    "events_hourly",
    "events_hourly_dense",
    "events_hourly_interpolated",
    "events_json_stats",
    "events_retention",
    "events_session_concurrency",
    "events_sessionize",
    "events_stream_dedup",
    "events_stream_hourly",
    "events_stream_sessions",
    "forecast_revenue_change",
    "orders_customer_fk_audit",
    "orders_per_customer_dist",
    "orders_priority_agg_ivm",
    "orders_quality_report",
    "orders_reject_profile",
    "orders_version_diff",
    "parts_pareto_80",
    "promotable_widget_suppliers",
    "waiting_sole_late_supplier",
    # --- (b) new in round 12 (never driver-rowed) ---
    "big_orders_preagg",
    # --- (c) stalest r8 rows, alphabetically first ---
    "brand_type_supplier_counts",
    "cheapest_supplier_per_part",
    "customer_erasure_audit",
    "customers_churned",
    "customers_retained",
    "customers_without_orders",
    "doc_bigram_pmi",
    "doc_chunks",
    "doc_decontaminate_spans",
    "doc_dup_clusters",
    "doc_minhash_incremental",
    "doc_minhash_near_dup",
    "doc_prefix_jaccard",
    "doc_quality_model",
    "doc_simhash_near_dup",
    "doc_weighted_sample",
    "emb_cosine_near_dup_lsh",
    "events_asof_last_view",
    "events_daily_ewma",
    "events_key_skew",
    "events_promo_range_join",
    "events_stream_attribution",
    "events_user_hll",
    "events_value_quantiles",
    "idle_rich_customers_by_nation",
    "late_shipment_priority",
    "lineitem_profile",
    "lineitem_unpivot_metrics",
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
