"""Distribution-drift measurement: PSI / KL over fixed bins.

Population Stability Index is the standard production gate for "has
this feature's distribution moved since the reference window" — the
check a training pipeline runs before retraining on a new crawl, and
a feature store runs per feature per day. PSI = Σ (p_cur − p_ref) ·
ln(p_cur / p_ref) over bins; the same binned counts give directed
KL(cur‖ref). Rules of thumb: <0.1 stable, 0.1-0.25 drifting, >0.25
shifted.

Determinism / cross-engine exactness: bins are FIXED literal-width
intervals (no data-dependent quantile edges — those would make the
bin boundaries themselves a float race), counts are exact bigints,
and proportions are Laplace-smoothed count ratios (cnt+1)/(n+bins) so
empty bins stay finite without dropping mass. Every per-bin term is a
pure function of four bigints, so both engines produce the identical
doubles; only the summed scalars ride the decimal lattice.

Scale shape (100 TB): one map-side-combined aggregation per side
reduces each corpus to ≤ n_bins rows; the bin-level join and the
1-row totals broadcast are constant-size. No window, no collect; the
two scans are embarrassingly parallel. Skew-proof: the bin domain is
bounded by construction.

Reference analog: none — the reference recomputes its dashboard from
scratch per load (streamlit/utils/data_loader.py); drift gating is
what replaces "eyeball the new histogram" at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def fixed_bin(col: Column, lo: float, width: float, n_bins: int) -> Column:
    """Bin index in [0, n_bins): fixed width, clamped at both ends so
    out-of-range values land in the edge bins rather than vanishing."""
    raw = F.floor((col - F.lit(lo)) / F.lit(width)).cast("int")
    return F.greatest(F.lit(0), F.least(F.lit(n_bins - 1), raw))


def psi_bins(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    lo: float,
    width: float,
    n_bins: int,
) -> DataFrame:
    """Per-bin drift table: ``(bin, ref_cnt, cur_cnt, p_ref, p_cur,
    psi_term, kl_term)`` ordered by bin, one row per bin with any mass.

    ``p_*`` are Laplace-smoothed ``(cnt+1)/(n+n_bins)``; ``psi_term``
    is the bin's additive PSI contribution, ``kl_term`` the KL(cur‖ref)
    contribution. Sum them (decimal lattice) for the scalars — or use
    :func:`psi_report` which does.
    """
    b = fixed_bin(F.col(col), lo, width, n_bins)

    def side(df: DataFrame, name: str) -> DataFrame:
        return (
            df.where(F.col(col).isNotNull())
            .select(b.alias("bin"))
            .groupBy("bin")
            .agg(F.count("*").alias(f"{name}_cnt"))
        )

    r, c = side(ref, "ref"), side(cur, "cur")
    joined = r.join(c, "bin", "full_outer").select(
        "bin",
        F.coalesce("ref_cnt", F.lit(0)).alias("ref_cnt"),
        F.coalesce("cur_cnt", F.lit(0)).alias("cur_cnt"),
    )
    return psi_from_counts(joined, n_bins)


def psi_from_counts(bin_counts: DataFrame, n_bins: int) -> DataFrame:
    """The drift arithmetic over pre-binned counts: input ``(bin,
    ref_cnt, cur_cnt)``, output the :func:`psi_bins` table. Split out
    so ANY counting front end — the batch scan, a Structured
    Streaming aggregation, a sketch merge — feeds the same exact
    smoothing/term formulas (both totals fold in as 1-row
    broadcasts)."""
    rt = bin_counts.agg(F.sum("ref_cnt").alias("ref_n"))
    ct = bin_counts.agg(F.sum("cur_cnt").alias("cur_n"))
    joined = bin_counts.join(F.broadcast(rt)).join(F.broadcast(ct))
    p_ref = (F.col("ref_cnt") + 1) / (F.col("ref_n") + n_bins)
    p_cur = (F.col("cur_cnt") + 1) / (F.col("cur_n") + n_bins)
    return joined.select(
        "bin",
        F.col("ref_cnt").cast("bigint").alias("ref_cnt"),
        F.col("cur_cnt").cast("bigint").alias("cur_cnt"),
        p_ref.alias("p_ref"),
        p_cur.alias("p_cur"),
        ((p_cur - p_ref) * F.log(p_cur / p_ref)).alias("psi_term"),
        (p_cur * F.log(p_cur / p_ref)).alias("kl_term"),
    ).orderBy("bin")


def psi_report(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    lo: float,
    width: float,
    n_bins: int,
) -> DataFrame:
    """1-row drift summary: ``(ref_n, cur_n, psi, kl_cur_ref)``.

    Scalar sums ride the decimal(18,6) lattice so partition order
    cannot perturb the low bits (the per-term doubles are themselves
    engine-exact count-ratio arithmetic).
    """
    bins = psi_bins(ref, cur, col, lo, width, n_bins)
    dsum6 = lambda c: F.sum(F.col(c).cast("decimal(18,6)")).cast("double")  # noqa: E731
    return bins.agg(
        F.sum("ref_cnt").cast("bigint").alias("ref_n"),
        F.sum("cur_cnt").cast("bigint").alias("cur_n"),
        dsum6("psi_term").alias("psi"),
        dsum6("kl_term").alias("kl_cur_ref"),
    )


def ks_2samp_exact(
    a: DataFrame,
    b: DataFrame,
    col: str,
    bucket: Column | None = None,
) -> DataFrame:
    """1-row ``(n_a, n_b, ks_num, ks_d, at_value)`` — the exact
    two-sample Kolmogorov-Smirnov statistic, no binning, no sampling.

    D = max_x |F_a(x) − F_b(x)| over the pooled distinct values (both
    ECDFs right-continuous: the cumulative counts INCLUDE x). The
    maximized quantity is the INTEGER ``|cum_a·n_b − cum_b·n_a|`` —
    every candidate is exact, so the argmax is deterministic at any
    partition order; ``ks_d = ks_num / (n_a·n_b)`` is the single
    float division. ``at_value`` is the smallest value attaining the
    max (ties broken by the lexicographic struct max on
    ``(diff, −value)``). PSI (above) answers "how much mass moved
    between fixed bins"; KS answers "how far apart are the CDFs at the
    worst point" with zero binning decisions — the pair covers both
    drift-gate styles.

    ``bucket`` must be a NON-NULL ascending-order-preserving
    coarsening of the value (default ``floor(value)`` — fine when the
    value's range/unit makes integer steps a bounded bucket domain;
    pass e.g. ``floor(col/1000)`` for wide ranges).

    Scale shape (100 TB): one (value) hash aggregation with map-side
    partials pools both sides into |distinct values| rows; the two
    global prefix sums are two-phase bucketed running sums (no
    single-task window over data); totals fold in as a 1-row
    broadcast; the argmax is a plain aggregate. Products ride
    decimal(38,6) so counts up to ~1e15 cannot overflow (bigint
    emission of ``ks_num`` is exact to 2^63 like the AUC numerator).
    NULL values are excluded on both sides.
    """
    from etl_mudah_spark.operators.sampling import bucketed_running_sum

    def side(df: DataFrame, ca: int, cb: int) -> DataFrame:
        return df.where(F.col(col).isNotNull()).select(
            F.col(col).alias("_v"),
            F.lit(ca).alias("_ia"),
            F.lit(cb).alias("_ib"),
        )

    g = (
        side(a, 1, 0)
        .unionByName(side(b, 0, 1))
        .groupBy("_v")
        .agg(
            F.sum("_ia").cast("bigint").alias("_ca"),
            F.sum("_ib").cast("bigint").alias("_cb"),
        )
    )
    bk = F.floor(F.col("_v")).cast("bigint") if bucket is None else bucket
    cum = bucketed_running_sum(
        g,
        bucket=bk,
        order_cols=[F.col("_v")],
        val=F.col("_ca").cast("decimal(38,6)"),
        sum_col="_cum_a",
    )
    cum = bucketed_running_sum(
        cum,
        bucket=bk,
        order_cols=[F.col("_v")],
        val=F.col("_cb").cast("decimal(38,6)"),
        sum_col="_cum_b",
    )
    tot = g.agg(
        F.sum("_ca").cast("bigint").alias("_n_a"),
        F.sum("_cb").cast("bigint").alias("_n_b"),
    )
    diff = F.abs(
        F.col("_cum_a").cast("decimal(38,0)") * F.col("_n_b")
        - F.col("_cum_b").cast("decimal(38,0)") * F.col("_n_a")
    )
    best = (
        cum.join(F.broadcast(tot))
        .agg(
            F.max("_n_a").alias("n_a"),
            F.max("_n_b").alias("n_b"),
            F.max(
                F.struct(diff.alias("d"), (-F.col("_v")).alias("nv"))
            ).alias("_m"),
        )
    )
    return best.select(
        "n_a",
        "n_b",
        F.col("_m.d").cast("bigint").alias("ks_num"),
        (
            F.col("_m.d").cast("double")
            / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
        ).alias("ks_d"),
        (-F.col("_m.nv")).alias("at_value"),
    )


def ks_binned_from_counts(bin_counts: DataFrame, n_bins: int) -> DataFrame:
    """Binned-ECDF KS over pre-binned counts: input ``(bin, ref_cnt,
    cur_cnt)`` (the same relation :func:`psi_from_counts` takes),
    output 1 row ``(n_ref, n_cur, ks_num, ks_binned, at_bin)``.

    The statistic is the max CDF gap evaluated at the n_bins fixed bin
    boundaries — a LOWER bound on the exact :func:`ks_2samp_exact` D
    (coarsening can only hide gaps, never invent them), which is the
    right trade for a STREAMING monitor: the (side, bin) counts are
    constant-size state, where exact KS would need the full
    distinct-value distribution. Arithmetic is the same integer
    |cum_ref·n_cur − cum_cur·n_ref| maximization (deterministic argmax,
    smallest bin on ties via the (diff, −bin) struct max); the cumsum
    window runs over the ≤ n_bins count rows, never data.
    """
    wcum = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = bin_counts.select(
        "bin",
        F.sum("ref_cnt").over(wcum).cast("bigint").alias("_cr"),
        F.sum("cur_cnt").over(wcum).cast("bigint").alias("_cc"),
    )
    tot = bin_counts.agg(
        F.sum("ref_cnt").cast("bigint").alias("_nr"),
        F.sum("cur_cnt").cast("bigint").alias("_nc"),
    )
    diff = F.abs(
        F.col("_cr").cast("decimal(38,0)") * F.col("_nc")
        - F.col("_cc").cast("decimal(38,0)") * F.col("_nr")
    )
    best = cum.join(F.broadcast(tot)).agg(
        F.max("_nr").alias("n_ref"),
        F.max("_nc").alias("n_cur"),
        F.max(F.struct(diff.alias("d"), (-F.col("bin")).alias("nb"))).alias(
            "_m"
        ),
    )
    return best.select(
        "n_ref",
        "n_cur",
        F.col("_m.d").cast("bigint").alias("ks_num"),
        (
            F.col("_m.d").cast("double")
            / (F.col("n_ref").cast("double") * F.col("n_cur").cast("double"))
        ).alias("ks_binned"),
        (-F.col("_m.nb")).cast("int").alias("at_bin"),
    )
