"""Exact-AUC pins: known closed-form values on tiny frames, tie
handling, and degenerate single-class inputs (ml/metrics.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_mudah_spark.ml.metrics import binary_auc_exact


def _auc(spark, rows):
    df = spark.createDataFrame(rows, "y int, s double")
    return binary_auc_exact(df, "y", "s").first()


def test_perfect_separation(spark):
    r = _auc(spark, [(1, 0.9), (1, 0.8), (0, 0.2), (0, 0.1)])
    assert (r.n_pos, r.n_neg) == (2, 2)
    assert r.num_pairs2 == 2 * (2 * 2)  # all 4 pos-neg pairs concordant, x2
    assert r.auc == 1.0


def test_perfect_inversion(spark):
    r = _auc(spark, [(0, 0.9), (0, 0.8), (1, 0.2), (1, 0.1)])
    assert r.auc == 0.0


def test_all_tied_scores_give_half(spark):
    r = _auc(spark, [(1, 0.5), (1, 0.5), (0, 0.5), (0, 0.5)])
    # Every pos-neg pair is a tie -> each contributes 1 of 2.
    assert r.num_pairs2 == 4
    assert r.auc == 0.5


def test_mixed_ties_match_mann_whitney(spark):
    # pos scores {0.7, 0.5}, neg scores {0.5, 0.3}:
    # (0.7 vs 0.5)=1, (0.7 vs 0.3)=1, (0.5 vs 0.5)=0.5, (0.5 vs 0.3)=1
    # U = 3.5 over 4 pairs -> AUC 0.875, numerator2 = 7.
    r = _auc(spark, [(1, 0.7), (1, 0.5), (0, 0.5), (0, 0.3)])
    assert r.num_pairs2 == 7
    assert r.auc == pytest.approx(0.875)


def test_null_rows_excluded(spark):
    r = _auc(
        spark,
        [(1, 0.9), (0, 0.1), (None, 0.5), (1, None)],
    )
    assert (r.n_pos, r.n_neg) == (1, 1)
    assert r.auc == 1.0


def test_single_class_yields_null_auc(spark):
    r = _auc(spark, [(1, 0.9), (1, 0.1)])
    assert (r.n_pos, r.n_neg) == (2, 0)
    assert r.num_pairs2 == 0
    assert r.auc is None  # 0/0 division -> NULL, not a crash


def test_custom_bucket_for_unbounded_scores(spark):
    rows = [(i % 2, float(i)) for i in range(200)]
    df = spark.createDataFrame(rows, "y int, s double")
    r = binary_auc_exact(
        df, "y", "s", score_bucket=F.floor(F.col("_s") / 10).cast("int")
    ).first()
    # odd scores are the positives: strictly above on half the pairs.
    exp_num2 = sum(
        2 if p > n else (1 if p == n else 0)
        for p in range(1, 200, 2)
        for n in range(0, 200, 2)
    )
    assert r.num_pairs2 == exp_num2
    assert r.auc == pytest.approx(exp_num2 / (2.0 * 100 * 100))


# --- PR curve / average precision / Brier decomposition ---

from etl_mudah_spark.ml.metrics import (  # noqa: E402
    average_precision_exact,
    brier_decomposition_exact,
    pr_curve_exact,
)


def _frame(spark, rows):
    return spark.createDataFrame(rows, "y int, s double")


def test_pr_curve_blocks_and_divisions(spark):
    df = _frame(spark, [(1, 0.9), (0, 0.8), (1, 0.7), (0, 0.6)])
    rows = {r.score: r for r in pr_curve_exact(df, "y", "s").collect()}
    assert rows[0.9].cum_pos == 1 and rows[0.9].cum_neg == 0
    assert rows[0.9].precision == 1.0 and rows[0.9].recall == 0.5
    assert rows[0.7].cum_pos == 2 and rows[0.7].cum_neg == 1
    assert rows[0.7].precision == pytest.approx(2 / 3)
    assert rows[0.7].recall == 1.0
    assert rows[0.6].precision == 0.5 and rows[0.6].recall == 1.0


def test_pr_curve_ties_collapse_into_one_block(spark):
    df = _frame(spark, [(1, 0.5), (0, 0.5), (1, 0.5), (0, 0.5)])
    rows = pr_curve_exact(df, "y", "s").collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.pos, r.neg, r.precision, r.recall) == (2, 2, 0.5, 1.0)


def test_average_precision_step_rule(spark):
    df = _frame(spark, [(1, 0.9), (0, 0.8), (1, 0.7), (0, 0.6)])
    r = average_precision_exact(df, "y", "s").first()
    assert (r.n_pos, r.n_neg) == (2, 2)
    # (1*1 + 1*(2/3))/2, with the 2/3 term on the decimal(18,6) lattice.
    assert r.avg_precision == pytest.approx((1.0 + 0.666667) / 2, abs=1e-9)


def test_average_precision_perfect_ranking_is_one(spark):
    df = _frame(spark, [(1, 0.9), (1, 0.8), (0, 0.2), (0, 0.1)])
    r = average_precision_exact(df, "y", "s").first()
    assert r.avg_precision == pytest.approx(1.0, abs=1e-6)


def test_average_precision_single_class_null(spark):
    df = _frame(spark, [(0, 0.9), (0, 0.1)])
    r = average_precision_exact(df, "y", "s").first()
    assert r.n_pos == 0 and r.avg_precision is None


def test_brier_decomposition_identity(spark):
    df = _frame(spark, [(1, 0.8), (0, 0.8), (1, 0.6), (0, 0.2)])
    r = brier_decomposition_exact(df, "y", "s").first()
    assert (r.n, r.n_pos) == (4, 2)
    assert r.brier == pytest.approx(0.22, abs=1e-6)
    assert r.uncertainty == pytest.approx(0.25)
    assert r.resolution == pytest.approx(0.125, abs=1e-6)
    assert r.reliability == pytest.approx(0.095, abs=1e-6)
    # Murphy identity (exact up to the documented lattice quantization).
    assert r.brier == pytest.approx(
        r.uncertainty - r.resolution + r.reliability, abs=1e-5
    )


def test_brier_perfect_sharp_forecast(spark):
    df = _frame(spark, [(1, 1.0), (0, 0.0), (1, 1.0)])
    r = brier_decomposition_exact(df, "y", "s").first()
    assert r.brier == 0.0 and r.reliability == 0.0
    # resolution rides the decimal(18,6) lattice; uncertainty does not.
    assert r.resolution == pytest.approx(r.uncertainty, abs=1e-5)


# --- grouped closed-form OLS ---

from etl_mudah_spark.ml.metrics import ols_fit_grouped  # noqa: E402


def test_ols_exact_line_and_degenerates(spark):
    rows = [
        # perfect line y = 2x + 1
        ("a", 0, 1), ("a", 1, 3), ("a", 2, 5),
        # constant y: slope 0, r2 NULL (zero y-variance)
        ("b", 0, 7), ("b", 1, 7), ("b", 2, 7),
        # single point: everything but n NULL
        ("c", 4, 9),
    ]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    out = {r.g: r for r in ols_fit_grouped(df, ["g"], "x", "y").collect()}
    a = out["a"]
    assert (a.n, a.slope, a.intercept, a.r2) == (3, 2.0, 1.0, 1.0)
    b = out["b"]
    assert (b.slope, b.intercept) == (0.0, 7.0) and b.r2 is None
    c = out["c"]
    assert c.n == 1 and c.slope is None and c.r2 is None


def test_ols_r2_matches_correlation_squared(spark):
    rows = [("g", x, y) for x, y in [(0, 1), (1, 1), (2, 4), (3, 5), (4, 5)]]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    r = ols_fit_grouped(df, ["g"], "x", "y").first()
    import statistics

    xs, ys = [p[1] for p in rows], [p[2] for p in rows]
    corr = statistics.correlation(xs, ys)
    assert r.r2 == pytest.approx(corr * corr)
    assert r.slope == pytest.approx(
        statistics.covariance(xs, ys) / statistics.variance(xs)
    )


# --- Kaplan-Meier survival ---

from etl_mudah_spark.ml.metrics import km_survival  # noqa: E402


def test_km_textbook_example(spark):
    # durations (event=1 observed, 0 censored):
    # 6,6,6+,7,10+,13,16+  — the classic KM worked example.
    rows = [(6, 1), (6, 1), (6, 0), (7, 1), (10, 0), (13, 1), (16, 0)]
    df = spark.createDataFrame(rows, "dur int, ev int")
    out = {r.t: r for r in km_survival(df, "dur", "ev").collect()}
    assert out[6].n_risk == 7 and out[6].d_events == 2 and out[6].n_censored == 1
    assert out[6].survival == pytest.approx(5 / 7, abs=1e-4)
    assert out[7].n_risk == 4
    assert out[7].survival == pytest.approx(5 / 7 * 3 / 4, abs=1e-4)
    # censoring-only rows keep S flat
    assert out[10].d_events == 0
    assert out[10].survival == pytest.approx(out[7].survival)
    assert out[13].n_risk == 2
    assert out[13].survival == pytest.approx(5 / 7 * 3 / 4 * 1 / 2, abs=1e-4)
    assert out[16].survival == pytest.approx(out[13].survival)


def test_km_risk_set_exhaustion_hits_exact_zero(spark):
    rows = [(3, 1), (5, 1), (5, 1)]
    df = spark.createDataFrame(rows, "dur int, ev int")
    out = {r.t: r for r in km_survival(df, "dur", "ev").collect()}
    assert out[3].survival == pytest.approx(2 / 3, abs=1e-4)
    # at t=5 both remaining subjects exit: survival is literal 0.0.
    assert out[5].n_risk == 2 and out[5].d_events == 2
    assert out[5].survival == 0.0


def test_km_all_censored_stays_at_one(spark):
    df = spark.createDataFrame([(1, 0), (2, 0), (9, 0)], "dur int, ev int")
    for r in km_survival(df, "dur", "ev").collect():
        assert r.survival == 1.0


# --- log-rank test and Wilson bounds ---

from etl_mudah_spark.ml.metrics import logrank_test, wilson_bounds  # noqa: E402


def test_logrank_identical_groups_zero(spark):
    rows = [(1, 1, True), (2, 1, True), (1, 1, False), (2, 1, False)]
    df = spark.createDataFrame(rows, "dur int, ev int, grp boolean")
    r = logrank_test(df, "dur", "ev", "grp").first()
    assert (r.n_a, r.n_b, r.events_a, r.events_b) == (2, 2, 2, 2)
    assert r.o_minus_e == pytest.approx(0.0, abs=1e-6)
    assert r.chi2 == pytest.approx(0.0, abs=1e-5)


def test_logrank_disjoint_schedules(spark):
    # A churns at t=1, B at t=5: O-E = 1, V = 1/3, chi2 = 3.
    rows = [(1, 1, True), (1, 1, True), (5, 1, False), (5, 1, False)]
    df = spark.createDataFrame(rows, "dur int, ev int, grp boolean")
    r = logrank_test(df, "dur", "ev", "grp").first()
    assert r.o_minus_e == pytest.approx(1.0, abs=1e-5)
    assert r.variance == pytest.approx(1 / 3, abs=1e-5)
    assert r.chi2 == pytest.approx(3.0, abs=1e-4)


def test_logrank_censoring_shrinks_risk_sets(spark):
    # a censored A-subject at t=1 leaves the t=2 risk set.
    rows = [(1, 0, True), (2, 1, True), (2, 1, False)]
    df = spark.createDataFrame(rows, "dur int, ev int, grp boolean")
    r = logrank_test(df, "dur", "ev", "grp").first()
    # at t=2: ra=1, rb=1, d=2 -> ome = 1 - 2*0.5 = 0; var = 0 (n-d=0).
    assert r.o_minus_e == pytest.approx(0.0, abs=1e-6)
    assert r.chi2 is None  # 0/0 -> NULL, not a crash


def test_wilson_bounds_known_value(spark):
    df = spark.createDataFrame([(0.5, 100)], "p double, n long")
    lo, hi = wilson_bounds(F.col("p"), F.col("n"))
    r = df.select(lo.alias("lo"), hi.alias("hi")).first()
    assert r.lo == pytest.approx(0.40383, abs=1e-4)
    assert r.hi == pytest.approx(0.59617, abs=1e-4)
    # edge p=1: interval stays inside [0, 1] (the Wald failure mode).
    e = (
        spark.createDataFrame([(1.0, 10)], "p double, n long")
        .select(
            wilson_bounds(F.col("p"), F.col("n"))[0].alias("lo"),
            wilson_bounds(F.col("p"), F.col("n"))[1].alias("hi"),
        )
        .first()
    )
    assert 0.0 <= e.lo <= e.hi <= 1.0
