"""Exact distributed model-evaluation metrics.

:func:`binary_auc_exact` computes ROC-AUC as the Mann-Whitney U
statistic — the probability a random positive outscores a random
negative, with ties counted half — WITHOUT sampling, approximation, or
a single-task global sort. pyspark.ml's BinaryClassificationEvaluator
approximates AUC from a 1000-bin curve and gives no cross-engine
reproducibility; a quality-filter pipeline that gates corpora on "AUC
must not regress" needs the exact statistic, bit-identical across
engines and runs.

Exactness: with per-score-group counts (pos_g, neg_g) ordered by
score ascending and cum_neg_below_g the negatives in strictly lower
groups,

    2·U = Σ_g pos_g · (2·cum_neg_below_g + neg_g)
    AUC = 2U / (2·n_pos·n_neg)

Every term is a bigint product (ties contribute exactly once — half of
the doubled weight), so the numerator is an exact integer at any
partition order, and the single final division produces the same IEEE
double everywhere.

Scale shape (100 TB): one (score) hash aggregation with map-side
partials reduces the corpus to |distinct scores| rows; the global
prefix sum over those groups uses the two-phase bucketed running sum
(operators/sampling.py) — per-bucket totals, a cumsum window over the
bounded bucket-count relation, and a parallel per-bucket window — so
no task ever sorts more than one bucket's score groups. The final
reduction is a single 1-row aggregate. No collect, no global window,
no crossJoin.

Reference analog: none — the reference's dashboards stop at R²
(streamlit/pages/price_prediction.py); exact AUC is the evaluation
primitive a classifier-based corpus filter needs at scale.

:func:`pr_curve_exact` / :func:`average_precision_exact` are the
precision-recall companions (the right lens when positives are rare —
a near-dup or toxicity filter at 0.1% prevalence can post 0.99 ROC-AUC
while its precision is garbage), built on the same
distinct-score-group machinery ordered DESCENDING.
:func:`brier_decomposition_exact` is the probability-quality metric
(Murphy's uncertainty − resolution + reliability split over the
distinct forecast values). All three follow the repo determinism
policy: per-term doubles are single-division count-ratio arithmetic on
exact bigints (identical in any engine), and every SUM of such terms
rides the decimal(18,6) lattice so aggregation order cannot move the
result.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_mudah_spark.operators.sampling import bucketed_running_sum


def binary_auc_exact(
    df: DataFrame,
    label_col: str,
    score_col: str,
    score_bucket: Column | None = None,
    n_buckets: int = 64,
) -> DataFrame:
    """1-row frame ``(n_pos, n_neg, num_pairs2, auc)`` — exact ROC-AUC.

    ``label_col`` must be 0/1 (int-castable boolean is fine);
    ``score_col`` any orderable numeric. ``num_pairs2`` is the exact
    integer 2·U (concordant pairs ×2 + ties ×1) so the driver can hash
    an integer even though ``auc`` is a double. Rows with a NULL label
    or score are excluded (mirror the filter in any oracle twin).

    ``score_bucket`` must be a non-null order-preserving coarsening of
    the score (default: ``floor(score·n_buckets)`` clamped, correct for
    scores in [0, 1]); pass your own for unbounded scores.
    """
    y = F.col(label_col).cast("int")
    s = F.col(score_col)
    g = (
        df.where(y.isNotNull() & s.isNotNull())
        .select(s.alias("_s"), y.alias("_y"))
        .groupBy("_s")
        .agg(
            F.sum("_y").cast("bigint").alias("_pos"),
            F.sum(1 - F.col("_y")).cast("bigint").alias("_neg"),
        )
    )
    if score_bucket is None:
        bucket = F.least(
            F.floor(F.col("_s") * n_buckets).cast("int"), F.lit(n_buckets - 1)
        )
    else:
        bucket = score_bucket
    cum = bucketed_running_sum(
        g,
        bucket=bucket,
        order_cols=[F.col("_s")],
        val=F.col("_neg").cast("decimal(38,6)"),
        sum_col="_cum_neg",
    )
    below = (F.col("_cum_neg").cast("bigint") - F.col("_neg")).alias("_below")
    return (
        cum.select("_pos", "_neg", below)
        .agg(
            F.sum("_pos").cast("bigint").alias("n_pos"),
            F.sum("_neg").cast("bigint").alias("n_neg"),
            F.sum(F.col("_pos") * (2 * F.col("_below") + F.col("_neg")))
            .cast("bigint")
            .alias("num_pairs2"),
        )
        .select(
            "n_pos",
            "n_neg",
            "num_pairs2",
            F.try_divide(
                F.col("num_pairs2"), 2.0 * F.col("n_pos") * F.col("n_neg")
            ).alias("auc"),
        )
    )


def _score_groups(df: DataFrame, label_col: str, score_col: str) -> DataFrame:
    """``(_s, _pos, _neg)`` — one hash aggregation with map-side
    partials; the corpus reduces to |distinct scores| rows. NULL label
    or score rows are excluded (mirror the filter in oracle twins)."""
    y = F.col(label_col).cast("int")
    s = F.col(score_col)
    return (
        df.where(y.isNotNull() & s.isNotNull())
        .select(s.alias("_s"), y.alias("_y"))
        .groupBy("_s")
        .agg(
            F.sum("_y").cast("bigint").alias("_pos"),
            F.sum(1 - F.col("_y")).cast("bigint").alias("_neg"),
        )
    )


def pr_curve_exact(
    df: DataFrame,
    label_col: str,
    score_col: str,
    score_bucket: Column | None = None,
    n_buckets: int = 64,
) -> DataFrame:
    """Exact precision-recall curve: one row per distinct score
    (threshold), DESCENDING — ``(score, pos, neg, cum_pos, cum_neg,
    precision, recall)`` where ``cum_*`` count rows scoring >= the
    threshold.

    ``precision``/``recall`` are each ONE division of exact bigints,
    so every emitted double is engine-identical. ``score_bucket``
    must be a non-null coarsening of the score aligned with the
    DESCENDING order (lower bucket = higher score; the default
    ``-floor(score·n_buckets)`` is correct for scores in [0, 1]).

    Scale shape (100 TB): the score aggregation collapses the corpus;
    the two global prefix sums use the two-phase bucketed running sum
    (no single-task window over data); ``n_pos`` folds in as a 1-row
    broadcast. The curve itself is |distinct scores| rows.
    """
    g = _score_groups(df, label_col, score_col)
    if score_bucket is None:
        bucket = -F.least(
            F.floor(F.col("_s") * n_buckets).cast("int"), F.lit(n_buckets - 1)
        )
    else:
        bucket = score_bucket
    cum = bucketed_running_sum(
        g,
        bucket=bucket,
        order_cols=[F.col("_s").desc()],
        val=F.col("_pos").cast("decimal(38,6)"),
        sum_col="_cum_pos",
    )
    cum = bucketed_running_sum(
        cum,
        bucket=bucket,
        order_cols=[F.col("_s").desc()],
        val=F.col("_neg").cast("decimal(38,6)"),
        sum_col="_cum_neg",
    )
    tot = g.agg(F.sum("_pos").cast("bigint").alias("_n_pos"))
    cp = F.col("cum_pos")
    cn = F.col("cum_neg")
    return (
        cum.select(
            F.col("_s").alias("score"),
            F.col("_pos").alias("pos"),
            F.col("_neg").alias("neg"),
            F.col("_cum_pos").cast("bigint").alias("cum_pos"),
            F.col("_cum_neg").cast("bigint").alias("cum_neg"),
        )
        .join(F.broadcast(tot))
        .select(
            "score",
            "pos",
            "neg",
            "cum_pos",
            "cum_neg",
            (cp * 1.0 / (cp + cn)).alias("precision"),
            F.try_divide(cp, F.col("_n_pos")).alias("recall"),
        )
    )


def average_precision_exact(
    df: DataFrame,
    label_col: str,
    score_col: str,
    score_bucket: Column | None = None,
    n_buckets: int = 64,
) -> DataFrame:
    """1-row ``(n_pos, n_neg, avg_precision)`` — tie-blocked average
    precision, AP = (1/n_pos)·Σ_g pos_g · precision_g over distinct
    scores descending (sklearn's step-interpolation rule, which ties
    collapse into blocks naturally).

    Each term is ``(pos_g·cum_pos_g) / (cum_pos_g+cum_neg_g)`` — an
    exact bigint product with ONE division — and the term sum rides
    the decimal(18,6) lattice, so aggregation order cannot move the
    double. The final ``/ n_pos`` is the only other division.
    """
    curve = pr_curve_exact(df, label_col, score_col, score_bucket, n_buckets)
    term = (F.col("pos") * F.col("cum_pos")) * 1.0 / (
        F.col("cum_pos") + F.col("cum_neg")
    )
    return (
        curve.agg(
            F.max("cum_pos").cast("bigint").alias("n_pos"),
            F.max("cum_neg").cast("bigint").alias("n_neg"),
            F.sum(term.cast("decimal(18,6)")).cast("double").alias("_ap_sum"),
        )
        .select(
            "n_pos",
            "n_neg",
            F.try_divide(F.col("_ap_sum"), F.col("n_pos")).alias(
                "avg_precision"
            ),
        )
    )


def brier_decomposition_exact(
    df: DataFrame, label_col: str, score_col: str
) -> DataFrame:
    """1-row ``(n, n_pos, brier, uncertainty, resolution,
    reliability)`` — the Brier score and its Murphy decomposition with
    forecast bins = the distinct score values (the exact, unbinned
    decomposition: brier = uncertainty − resolution + reliability up
    to the documented decimal-lattice quantization).

    Per score group g: brier contribution ``n_g·s² − 2·s·pos_g +
    pos_g`` (y² = y), reliability ``n_g·(s − pos_g/n_g)²``, resolution
    ``n_g·(pos_g/n_g − ybar)²`` — every factor a bigint or a single
    division of bigints, summed on the decimal lattice, divided by n
    once. One score-group aggregation + 1-row broadcast of the base
    rate; no window at all.
    """
    g = _score_groups(df, label_col, score_col)
    tot = g.agg(
        F.sum(F.col("_pos") + F.col("_neg")).cast("bigint").alias("_n"),
        F.sum("_pos").cast("bigint").alias("_np"),
    )
    j = g.join(F.broadcast(tot))
    s = F.col("_s")
    n_g = F.col("_pos") + F.col("_neg")
    obar = F.col("_pos") * 1.0 / n_g
    ybar = F.col("_np") * 1.0 / F.col("_n")
    dsum6 = lambda c: F.sum(c.cast("decimal(18,6)")).cast("double")  # noqa: E731
    agg = j.agg(
        F.max("_n").alias("n"),
        F.max("_np").alias("n_pos"),
        F.max(ybar).alias("_ybar"),
        dsum6(n_g * s * s - 2 * s * F.col("_pos") + F.col("_pos")).alias("_b"),
        dsum6(n_g * (obar - ybar) * (obar - ybar)).alias("_res"),
        dsum6(n_g * (s - obar) * (s - obar)).alias("_rel"),
    )
    return agg.select(
        "n",
        "n_pos",
        (F.col("_b") / F.col("n")).alias("brier"),
        (F.col("_ybar") * (1 - F.col("_ybar"))).alias("uncertainty"),
        (F.col("_res") / F.col("n")).alias("resolution"),
        (F.col("_rel") / F.col("n")).alias("reliability"),
    )


def ols_fit_grouped(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group closed-form OLS of y on x: ``(group_cols..., n,
    slope, intercept, r2)``.

    ``x_col``/``y_col`` must be bigint-exact (cast integer-valued
    columns first): the normal-equation sums (Σx, Σy, Σxy, Σx², Σy²)
    are then exact integers at any partition order, and

        slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
        r²    = slope · (n·Σxy − Σx·Σy) / (n·Σy² − (Σy)²)

    are one/two divisions of exact bigints — identical doubles in any
    engine, no lattice needed. Degenerate groups (single x, constant
    y) yield NULL slope/r² via try_divide rather than a crash. ONE
    hash aggregation per group; no window, no broadcast.

    Keep x compact (an index from a fixed epoch, not a raw year·10⁴
    date) so n·Σx² stays far from the 2⁶³ bigint edge — with
    |x| ≤ 10³ and n ≤ 10⁶ the products are ≤ 10¹⁵.
    """
    x = F.col(x_col).cast("bigint")
    y = F.col(y_col).cast("bigint")
    g = df.groupBy(*group_cols).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(x).alias("_sx"),
        F.sum(y).alias("_sy"),
        F.sum(x * y).alias("_sxy"),
        F.sum(x * x).alias("_sxx"),
        F.sum(y * y).alias("_syy"),
    )
    num = g["n"] * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    denx = g["n"] * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    deny = g["n"] * F.col("_syy") - F.col("_sy") * F.col("_sy")
    slope = F.try_divide(num, denx)
    return g.select(
        *group_cols,
        "n",
        slope.alias("slope"),
        ((F.col("_sy") - slope * F.col("_sx")) / g["n"]).alias("intercept"),
        (slope * F.try_divide(num, deny)).alias("r2"),
    )


def km_survival(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    bucket: Column | None = None,
) -> DataFrame:
    """Kaplan–Meier survival curve: one row per distinct duration,
    ``(t, n_risk, d_events, n_censored, survival)`` ordered by t —
    the standard right-censored time-to-event estimator (churn
    lifetime, session longevity, hardware failure), S(t) =
    Π_{u≤t} (1 − d_u / n_risk_u).

    ``event_col`` is 1 when the terminal event was OBSERVED at the
    duration, 0 when the subject was censored there (still alive —
    we only know survival ≥ t). Determinism: the at-risk counts are
    exact integers from one reverse prefix sum; the product is
    computed as exp(Σ ln(1 − d/n)) with each ln term cast to the
    decimal(18,6) lattice BEFORE the cumulative sum, so partition
    order cannot move any S(t) (the ln/exp calls themselves follow
    the engine-wide ln-parity precedent). A duration where every
    remaining subject exits (d = n_risk) sends survival to exactly
    0.0 from that row on, via an integer terminal flag rather than
    ln(0).

    Scale shape (100 TB): one (duration) hash aggregation collapses
    the cohort to distinct durations; the three cumulative passes
    (totals, lattice ln terms, terminal flags) are two-phase bucketed
    running sums over that collapsed relation (``bucket`` defaults to
    ``floor(t/100)``); N folds in as a 1-row broadcast. No window
    over data, no collect.
    """
    t = F.col(duration_col)
    e = F.col(event_col).cast("int")
    g = (
        df.where(t.isNotNull() & e.isNotNull())
        .groupBy(t.alias("_t"))
        .agg(
            F.sum(e).cast("bigint").alias("_d"),
            F.sum(1 - e).cast("bigint").alias("_c"),
            F.count("*").cast("bigint").alias("_tot"),
        )
    )
    bk = F.floor(F.col("_t") / 100).cast("bigint") if bucket is None else bucket
    cum = bucketed_running_sum(
        g,
        bucket=bk,
        order_cols=[F.col("_t")],
        val=F.col("_tot").cast("decimal(38,6)"),
        sum_col="_cumtot",
    )
    tot = g.agg(F.sum("_tot").cast("bigint").alias("_n"))
    risk = (
        F.col("_n") - (F.col("_cumtot").cast("bigint") - F.col("_tot"))
    ).alias("_risk")
    w = cum.join(F.broadcast(tot)).select(
        "_t", "_d", "_c", "_tot", risk
    )
    ln_term = F.when(
        (F.col("_d") > 0) & (F.col("_d") < F.col("_risk")),
        F.log(1.0 - F.col("_d") * 1.0 / F.col("_risk")),
    ).otherwise(F.lit(0.0))
    term_flag = F.when(F.col("_d") == F.col("_risk"), 1).otherwise(0)
    w = w.select(
        "*",
        ln_term.cast("decimal(18,6)").alias("_lnt"),
        term_flag.alias("_tf"),
    )
    cum2 = bucketed_running_sum(
        w,
        bucket=bk,
        order_cols=[F.col("_t")],
        val=F.col("_lnt").cast("decimal(38,6)"),
        sum_col="_cumln",
    )
    cum3 = bucketed_running_sum(
        cum2,
        bucket=bk,
        order_cols=[F.col("_t")],
        val=F.col("_tf").cast("decimal(38,6)"),
        sum_col="_cumtf",
    )
    surv = F.when(
        F.col("_cumtf").cast("bigint") > 0, F.lit(0.0)
    ).otherwise(F.exp(F.col("_cumln").cast("double")))
    return cum3.select(
        F.col("_t").alias("t"),
        F.col("_risk").alias("n_risk"),
        F.col("_d").alias("d_events"),
        F.col("_c").alias("n_censored"),
        surv.alias("survival"),
    ).orderBy("t")


def logrank_test(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    group_col: str,
    bucket: Column | None = None,
) -> DataFrame:
    """Two-sample log-rank test: 1 row ``(n_a, n_b, events_a,
    events_b, o_minus_e, variance, chi2)`` — does group A (the rows
    where ``group_col`` is true) churn on a different schedule than
    group B, accounting for censoring? The hypothesis test that
    belongs next to :func:`km_survival`'s curves.

    At each distinct duration t with observed events: O − E
    contribution ``d_a − d·n_a/n`` and hypergeometric variance
    ``d·(n_a/n)·(1 − n_a/n)·(n − d)/(n − 1)``, with per-group at-risk
    counts n_a/n_b from reverse prefix sums. chi2 = (ΣO−E)²/ΣV ~ χ²₁
    under the null. Every term is a pure function of four exact
    bigints (identical doubles in any engine); the two sums ride the
    decimal lattice; the statistic is closed-form arithmetic on them.
    Same plan skeleton as KM: one (duration) aggregation with
    conditional per-group sums, two bucketed cumulative passes, a
    1-row totals broadcast. NULL durations/events/groups excluded.
    """
    t = F.col(duration_col)
    e = F.col(event_col).cast("int")
    a = F.col(group_col).cast("boolean").cast("int")
    g = (
        df.where(t.isNotNull() & e.isNotNull() & a.isNotNull())
        .groupBy(t.alias("_t"))
        .agg(
            F.sum(a * e).cast("bigint").alias("_da"),
            F.sum((1 - a) * e).cast("bigint").alias("_db"),
            F.sum(a).cast("bigint").alias("_ta"),
            F.sum(1 - a).cast("bigint").alias("_tb"),
        )
    )
    bk = F.floor(F.col("_t") / 100).cast("bigint") if bucket is None else bucket
    cum = bucketed_running_sum(
        g,
        bucket=bk,
        order_cols=[F.col("_t")],
        val=F.col("_ta").cast("decimal(38,6)"),
        sum_col="_cuma",
    )
    cum = bucketed_running_sum(
        cum,
        bucket=bk,
        order_cols=[F.col("_t")],
        val=F.col("_tb").cast("decimal(38,6)"),
        sum_col="_cumb",
    )
    tot = g.agg(
        F.sum("_ta").cast("bigint").alias("_na"),
        F.sum("_tb").cast("bigint").alias("_nb"),
        F.sum("_da").cast("bigint").alias("_ea"),
        F.sum("_db").cast("bigint").alias("_eb"),
    )
    j = cum.join(F.broadcast(tot))
    ra = (F.col("_na") - (F.col("_cuma").cast("bigint") - F.col("_ta")))
    rb = (F.col("_nb") - (F.col("_cumb").cast("bigint") - F.col("_tb")))
    d = F.col("_da") + F.col("_db")
    n = ra + rb
    frac = ra * 1.0 / n
    ome = F.col("_da") - d * frac
    var = F.when(
        n > 1,
        d * frac * (1.0 - frac) * (n - d) * 1.0 / (n - 1),
    ).otherwise(F.lit(0.0))
    dsum6 = lambda c: F.sum(c.cast("decimal(18,6)")).cast("double")  # noqa: E731
    agg = j.where(d > 0).agg(
        F.max("_na").alias("n_a"),
        F.max("_nb").alias("n_b"),
        F.max("_ea").alias("events_a"),
        F.max("_eb").alias("events_b"),
        dsum6(ome).alias("o_minus_e"),
        dsum6(var).alias("variance"),
    )
    return agg.select(
        "n_a",
        "n_b",
        "events_a",
        "events_b",
        "o_minus_e",
        "variance",
        F.try_divide(
            F.col("o_minus_e") * F.col("o_minus_e"), F.col("variance")
        ).alias("chi2"),
    )


def wilson_bounds(p: Column, n: Column, z: float = 1.96) -> tuple[Column, Column]:
    """Wilson score interval (lo, hi) for a binomial proportion —
    the CI that behaves at p near 0/1 and small n, where the normal
    (Wald) interval escapes [0, 1]. Pure closed-form arithmetic on
    (p, n): sqrt is IEEE-correctly-rounded, so both engines produce
    identical bounds from identical inputs; write the same expression
    shape in any oracle twin."""
    zz = z * z
    denom = 1.0 + zz / n
    center = (p + zz / (2.0 * n)) / denom
    half = z * F.sqrt(p * (1.0 - p) / n + zz / (4.0 * n * n)) / denom
    return center - half, center + half
