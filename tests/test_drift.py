"""PSI/KL drift pins (operators/drift.py): hand-computed values on a
tiny frame, clamped edge bins, identical-distribution near-zero, and
the summary/report consistency."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from etl_mudah_spark.operators.drift import fixed_bin, psi_bins, psi_report


def _df(spark, vals):
    return spark.createDataFrame([(float(v),) for v in vals], "x double")


def test_fixed_bin_clamps_both_ends(spark):
    df = spark.range(1).select(
        fixed_bin(F.lit(-5.0), 0.0, 10.0, 4).alias("lo"),
        fixed_bin(F.lit(95.0), 0.0, 10.0, 4).alias("hi"),
        fixed_bin(F.lit(15.0), 0.0, 10.0, 4).alias("mid"),
    )
    r = df.first()
    assert (r.lo, r.hi, r.mid) == (0, 3, 1)


def test_psi_hand_computed(spark):
    # 2 bins of width 1 over [0, 2): ref = [3 in bin0, 1 in bin1],
    # cur = [1 in bin0, 3 in bin1]. Smoothed (cnt+1)/(n+2):
    # p_ref = (4/6, 2/6), p_cur = (2/6, 4/6).
    ref = _df(spark, [0.1, 0.2, 0.3, 1.5])
    cur = _df(spark, [0.4, 1.1, 1.2, 1.3])
    rows = psi_bins(ref, cur, "x", 0.0, 1.0, 2).collect()
    assert [(r.bin, r.ref_cnt, r.cur_cnt) for r in rows] == [(0, 3, 1), (1, 1, 3)]
    term = (2 / 6 - 4 / 6) * math.log((2 / 6) / (4 / 6))
    assert rows[0].psi_term == pytest.approx(term, rel=1e-12)
    assert rows[1].psi_term == pytest.approx(term, rel=1e-12)
    rep = psi_report(ref, cur, "x", 0.0, 1.0, 2).first()
    assert (rep.ref_n, rep.cur_n) == (4, 4)
    assert rep.psi == pytest.approx(2 * term, abs=2e-6)  # decimal(18,6) lattice
    kl = (2 / 6) * math.log((2 / 6) / (4 / 6)) + (4 / 6) * math.log((4 / 6) / (2 / 6))
    assert rep.kl_cur_ref == pytest.approx(kl, abs=2e-6)


def test_identical_distributions_score_zero(spark):
    vals = [0.5, 1.5, 2.5, 3.5] * 5
    rep = psi_report(_df(spark, vals), _df(spark, vals), "x", 0.0, 1.0, 4).first()
    assert rep.psi == pytest.approx(0.0, abs=1e-9)
    assert rep.kl_cur_ref == pytest.approx(0.0, abs=1e-9)


def test_empty_bin_on_one_side_stays_finite(spark):
    ref = _df(spark, [0.5] * 10)          # bin 1 empty on ref side
    cur = _df(spark, [0.5] * 5 + [1.5] * 5)
    rows = psi_bins(ref, cur, "x", 0.0, 1.0, 2).collect()
    assert all(math.isfinite(r.psi_term) for r in rows)
    b1 = [r for r in rows if r.bin == 1][0]
    assert b1.ref_cnt == 0 and b1.cur_cnt == 5
    assert b1.psi_term > 0  # mass appeared where there was none


def test_nulls_excluded(spark):
    ref = spark.createDataFrame([(0.5,), (None,)], "x double")
    cur = spark.createDataFrame([(0.5,), (None,), (None,)], "x double")
    rep = psi_report(ref, cur, "x", 0.0, 1.0, 2).first()
    assert (rep.ref_n, rep.cur_n) == (1, 1)


# --- exact two-sample KS ---

from etl_mudah_spark.operators.drift import ks_2samp_exact  # noqa: E402


def _ks(spark, a_vals, b_vals):
    a = spark.createDataFrame([(v,) for v in a_vals], "v double")
    b = spark.createDataFrame([(v,) for v in b_vals], "v double")
    return ks_2samp_exact(a, b, "v").first()


def test_ks_identical_samples_zero(spark):
    r = _ks(spark, [1.0, 2.0, 3.0], [1.0, 2.0, 3.0])
    assert r.ks_num == 0 and r.ks_d == 0.0


def test_ks_disjoint_samples_one(spark):
    r = _ks(spark, [1.0, 2.0], [3.0, 4.0])
    assert (r.n_a, r.n_b) == (2, 2)
    assert r.ks_num == 4 and r.ks_d == 1.0
    assert r.at_value == 2.0  # the gap peaks at a's max


def test_ks_overlap_and_argmin_tiebreak(spark):
    # diffs tie at 3 for v in {1, 2, 3}; smallest value wins.
    r = _ks(spark, [1.0, 2.0, 3.0], [2.0, 3.0, 4.0])
    assert r.ks_num == 3
    assert r.ks_d == pytest.approx(1 / 3)
    assert r.at_value == 1.0


def test_ks_negative_values_and_nulls(spark):
    a = spark.createDataFrame([(-1.5,), (0.5,), (None,)], "v double")
    b = spark.createDataFrame([(0.5,)], "v double")
    r = ks_2samp_exact(a, b, "v").first()
    assert (r.n_a, r.n_b) == (2, 1)
    assert r.ks_num == 1 and r.ks_d == 0.5
    assert r.at_value == -1.5


# --- binned KS from pre-binned counts ---

from etl_mudah_spark.operators.drift import ks_binned_from_counts  # noqa: E402


def test_ks_binned_matches_hand_computation(spark):
    # bins: ref [4,0,0], cur [0,0,4]; nr=nc=4.
    # cum_r: 4,4,4; cum_c: 0,0,4 -> diffs |16-0|,|16-0|,|16-16| = 16,16,0.
    df = spark.createDataFrame(
        [(0, 4, 0), (1, 0, 0), (2, 0, 4)],
        "bin int, ref_cnt long, cur_cnt long",
    )
    r = ks_binned_from_counts(df, 3).first()
    assert (r.n_ref, r.n_cur) == (4, 4)
    assert r.ks_num == 16 and r.ks_binned == 1.0
    assert r.at_bin == 0  # ties at bins 0 and 1 break to the smallest


def test_ks_binned_identical_sides_zero(spark):
    df = spark.createDataFrame(
        [(0, 2, 2), (1, 3, 3)], "bin int, ref_cnt long, cur_cnt long"
    )
    r = ks_binned_from_counts(df, 2).first()
    assert r.ks_num == 0 and r.ks_binned == 0.0


def test_ks_binned_is_lower_bound_of_exact(spark):
    # Exact KS on the raw values vs binned KS on a 2-bin coarsening.
    a_vals = [1.0, 2.0, 3.0, 4.0]
    b_vals = [2.5, 3.5, 4.5, 5.5]
    a = spark.createDataFrame([(v,) for v in a_vals], "v double")
    b = spark.createDataFrame([(v,) for v in b_vals], "v double")
    exact = ks_2samp_exact(a, b, "v").first()
    from etl_mudah_spark.operators.drift import fixed_bin

    def side(df, name):
        return (
            df.select(fixed_bin(F.col("v"), 0.0, 3.0, 2).alias("bin"))
            .groupBy("bin")
            .agg(F.count("*").alias(name))
        )

    wide = (
        side(a, "ref_cnt")
        .join(side(b, "cur_cnt"), "bin", "full_outer")
        .select(
            "bin",
            F.coalesce("ref_cnt", F.lit(0)).alias("ref_cnt"),
            F.coalesce("cur_cnt", F.lit(0)).alias("cur_cnt"),
        )
    )
    binned = ks_binned_from_counts(wide, 2).first()
    assert binned.ks_binned <= exact.ks_d + 1e-12
