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
_WINDOW_ROUND = 15

_PRIORITY = [
    # Round-15 window (exactly 50 names):
    # (a) the 34 remaining r10-stale names — resuming exactly where the
    #     round-14 comment said to (doc_split_leakage onward; the r14
    #     additions displaced the first eight). After this round no
    #     driver row is older than r11.
    # (b) no round-15 additions exist (optimization round — the
    #     registry is frozen at 234), so the remaining 16 slots go to
    #     the alphabetically-first r11-stale names. Round 16 should
    #     resume the r11-stale names at doc_global_shuffle onward.
    # Window discipline is MACHINE-CHECKED by
    # tests/test_correctness_rotation.py. All registered queries are
    # additionally sim-checked at sf0.01 every round regardless
    # (scripts/driver_sim.py).
    # --- (a) the 34 remaining r10-stale names ---
    "doc_split_leakage",
    "doc_token_budget_mix",
    "doc_token_stats",
    "doc_unigram_surprisal",
    "emb_pca_variance",
    "emb_semantic_dedup",
    "emb_srp_incremental_dedup",
    "events_ab_test",
    "events_conformal_interval",
    "events_daily_growth_accounting",
    "events_daily_users_rollup",
    "events_position_attribution",
    "events_seasonal_backtest",
    "events_sliding_5min_peak",
    "events_stream_drift_psi",
    "events_stream_enriched",
    "events_stream_ks_binned",
    "events_stream_quantile_sketch",
    "events_stream_sessions_native",
    "events_stream_sliding_peak",
    "events_stream_unconverted",
    "events_stream_users_rollup",
    "events_type_quantile_norm",
    "events_value_ks_drift",
    "events_value_mad_outliers",
    "events_value_quantile_rollup",
    "filter_stack_metrics",
    "flag_weighted_price_quartiles",
    "join_key_skew_profile",
    "part_fd_audit",
    "part_golden_records",
    "priority_monthly_trend_ols",
    "segment_churn_logrank",
    "supplier_ppr_topk",
    # --- (b) alphabetically-first r11-stale names filling to 50 ---
    "ann_bruteforce_topk",
    "ann_ivf_topk",
    "ann_ivfpq_topk",
    "ann_pq_topk",
    "ann_srp_topk",
    "brand_quartiles",
    "customer_balance_deciles",
    "daily_revenue_moving_avg",
    "disjunctive_join_revenue",
    "doc_bpe_encode",
    "doc_chunk_dedup",
    "doc_clean_pipeline",
    "doc_decontaminate",
    "doc_domain_mix",
    "doc_exact_dedup",
    "doc_fingerprint",
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
