"""Feature-engineering operators for training-data prep: leakage-safe
target encoding (the categorical-feature workhorse gradient-boosting
pipelines expect) with deterministic fold assignment.

Why out-of-fold: encoding a category by the mean of the target LEAKS
the target into the feature (a category seen once carries its own
label verbatim). The standard fix is K-fold: a row's encoding uses
only the target statistics of the OTHER folds, plus m-smoothing toward
the global prior so rare categories shrink to it:

    enc(cat, fold) = (sum_other_folds + m·μ) / (n_other_folds + m)

Determinism: fold assignment is a pure key function (``key % n_folds``
— the same no-RNG discipline as doc_train_split), per-(cat, fold)
target sums use the exact decimal lattice (functions/core._DEC) and
out-of-fold numerators are DECIMAL subtractions — exact at any
aggregation order — cast to double only for the final division, so two
runs or two engines agree double for double.

Scale shape: one shuffle on (cat, fold) with map-side partials; the
category re-aggregation and the 1-row grand total are tiny; the
encoder TABLE (|cats|·K rows) broadcasts back onto the training rows
(:func:`attach_target_encoding`) — the fact table is never shuffled.

Reference analog: none — the reference's ML prep is pandas
get_dummies-style (streamlit/pages); this is the scale-path encoder a
100 TB feature pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_mudah_spark.functions.core import _DEC


def fold_assign(key: Column | str, n_folds: int) -> Column:
    """Deterministic fold id in ``[0, n_folds)`` from an integer key —
    a pure function, so retries, resumes, and SQL oracles reproduce the
    same split (contract shared with doc_train_split's keymod)."""
    k = F.col(key) if isinstance(key, str) else key
    return F.pmod(k, F.lit(n_folds)).cast("int")


def target_encode_oof(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    fold_col: str | Column,
    smoothing: float = 20.0,
) -> DataFrame:
    """The out-of-fold encoder table: one row per observed
    ``(cat, fold)`` with ``n_fold`` (rows of that cat IN the fold) and
    ``encoding`` (the smoothed mean of the cat's target OUTSIDE the
    fold). A category confined to one fold gets exactly the global
    prior μ — the shrinkage limit, not a NaN.

    Returns columns ``(cat_col, fold, n_fold, encoding)``.
    """
    fold = F.col(fold_col) if isinstance(fold_col, str) else fold_col
    per = (
        df.select(cat_col, fold.alias("fold"), F.col(target_col).alias("_y"))
        .groupBy(cat_col, "fold")
        .agg(
            F.sum(F.col("_y").cast(_DEC)).alias("_fs"),
            F.count("*").alias("_fn"),
        )
    )
    tot = per.groupBy(cat_col).agg(
        F.sum("_fs").alias("_ts"), F.sum("_fn").alias("_tn")
    )
    grand = tot.agg(F.sum("_ts").alias("_gs"), F.sum("_tn").alias("_gn"))
    mu = F.col("_gs").cast("double") / F.col("_gn")
    enc = (
        (F.col("_ts") - F.col("_fs")).cast("double") + smoothing * mu
    ) / (F.col("_tn") - F.col("_fn") + smoothing)
    return (
        per.join(tot, cat_col)
        .join(F.broadcast(grand))
        .select(
            cat_col,
            "fold",
            F.col("_fn").alias("n_fold"),
            enc.alias("encoding"),
        )
    )


def attach_target_encoding(
    df: DataFrame,
    encoder: DataFrame,
    cat_col: str,
    fold_col: str | Column,
    out_col: str = "cat_enc",
) -> DataFrame:
    """Join the (tiny) encoder table back onto the training rows — a
    broadcast map-side join, the fact side is never shuffled. Rows of
    unseen (cat, fold) combinations keep a null encoding (impute with
    the prior downstream if the split can produce them)."""
    fold = F.col(fold_col) if isinstance(fold_col, str) else fold_col
    e = F.broadcast(
        encoder.select(
            F.col(cat_col).alias("_ec"),
            F.col("fold").alias("_ef"),
            F.col("encoding").alias(out_col),
        )
    )
    return df.withColumn("_fold", fold).join(
        e,
        (F.col(cat_col) == F.col("_ec")) & (F.col("_fold") == F.col("_ef")),
        "left",
    ).drop("_ec", "_ef", "_fold")


def winsorize(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    lower_p: float = 0.05,
    upper_p: float = 0.95,
    out_col: str | None = None,
) -> DataFrame:
    """Per-group percentile winsorization — the standard outlier
    treatment before training on heavy-tailed features: values below
    the group's ``lower_p`` exact percentile clip up to it, above
    ``upper_p`` clip down. Returns ``df`` plus ``out_col`` (default
    ``{value_col}_w``) and the bounds (``_lo``/``_hi`` suffixed), so
    the same bounds table can be persisted and applied to serving
    data (clip with TRAINING bounds — recomputing them on serving
    data leaks distribution shift into the feature).

    Exact percentiles (``F.percentile``, linear interpolation — the
    same definition as DuckDB's quantile_cont, the cross-engine
    contract every quantile query here relies on) via one map-side-
    combinable aggregate per group; the bounds table is tiny and
    broadcasts back. At 100 TB swap in percentile_approx and accept
    the documented rank error.
    """
    out_col = out_col or f"{value_col}_w"
    bounds = df.groupBy(*group_cols).agg(
        F.percentile(value_col, lower_p).alias(f"{value_col}_lo"),
        F.percentile(value_col, upper_p).alias(f"{value_col}_hi"),
    )
    # null-SAFE join back: groupBy keeps a NULL group, and a null-unsafe
    # equi-join would silently DROP every NULL-group training row.
    b = F.broadcast(
        bounds.select(
            *[F.col(c).alias(f"_bg_{c}") for c in group_cols],
            f"{value_col}_lo",
            f"{value_col}_hi",
        )
    )
    cond = None
    for c in group_cols:
        eq = F.col(c).eqNullSafe(F.col(f"_bg_{c}"))
        cond = eq if cond is None else cond & eq
    lo, hi = F.col(f"{value_col}_lo"), F.col(f"{value_col}_hi")
    return (
        df.join(b, cond)
        .drop(*[f"_bg_{c}" for c in group_cols])
        .withColumn(
            out_col,
            F.when(F.col(value_col) < lo, lo)
            .when(F.col(value_col) > hi, hi)
            .otherwise(F.col(value_col)),
        )
    )


def quantile_normalize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_bucket: Column | None = None,
    pooled_bucket: Column | None = None,
    rank_bin: int = 1024,
) -> DataFrame:
    """Map every group's value distribution onto the POOLED
    distribution (the limma/microarray quantile-normalization rule,
    the feature-alignment step before mixing heterogeneous sources):
    output one row per distinct (group, value) — ``(group_col, value,
    weight, mapped)`` — where ``mapped`` is the pooled value at global
    rank ceil(cum_group · N / n_group).

    Exactness: ranks are integers (the ceiling is ``(cum·N + n_g − 1)
    div n_g``, never a float quantile), so the mapped value is a
    deterministic LOOKUP, not an interpolation — both engines select
    the identical pooled value. After mapping, every group's weighted
    distribution is a subsample of the pooled one: group means
    converge, group quantiles agree — measured, not assumed, by the
    registered query's profile columns.

    Scale shape (100 TB): two value aggregations (per-group and
    pooled) collapse the corpus to distinct values; both cumulative
    ranks ride the two-phase bucketed prefix sums (``group_bucket`` /
    ``pooled_bucket`` default to floor(value)); the rank lookup is a
    point-in-interval join executed as the binned equi-join
    (operators/intervals.py — rank space chopped into ``rank_bin``
    buckets), never a non-equi broadcast. No global window over data,
    no collect.
    """
    from etl_mudah_spark.operators.intervals import interval_join_binned
    from etl_mudah_spark.operators.quantiles import (
        grouped_bucketed_running_sum,
    )
    from etl_mudah_spark.operators.sampling import bucketed_running_sum

    v = F.col(value_col)
    g = (
        df.where(v.isNotNull())
        .groupBy(F.col(group_col).alias("_g"), v.alias("_v"))
        .agg(F.count("*").cast("bigint").alias("_c"))
    )
    gbk = F.floor(F.col("_v")).cast("bigint") if group_bucket is None else group_bucket
    cg = grouped_bucketed_running_sum(
        g,
        ["_g"],
        bucket=gbk,
        order_cols=[F.col("_v")],
        val=F.col("_c").cast("decimal(38,6)"),
        sum_col="_cum",
    )
    ng = g.groupBy("_g").agg(F.sum("_c").cast("bigint").alias("_ng"))
    pooled = g.groupBy("_v").agg(F.sum("_c").cast("bigint").alias("_pc"))
    pbk = F.floor(F.col("_v")).cast("bigint") if pooled_bucket is None else pooled_bucket
    cp = bucketed_running_sum(
        pooled,
        bucket=pbk,
        order_cols=[F.col("_v")],
        val=F.col("_pc").cast("decimal(38,6)"),
        sum_col="_pcum",
    )
    tot = g.agg(F.sum("_c").cast("bigint").alias("_n"))
    tgt = (
        cg.join(ng, "_g")
        .join(F.broadcast(tot))
        .select(
            "_g",
            "_v",
            F.col("_c").alias("_w"),
            F.expr(
                "(CAST(_cum AS BIGINT) * _n + _ng - 1) div _ng"
            ).alias("_t"),
        )
        .withColumn("_t2", F.col("_t") + 1)
    )
    ranks = cp.select(
        F.col("_v").alias("_mv"),
        (F.col("_pcum").cast("bigint") - F.col("_pc") + 1).alias("_lo"),
        (F.col("_pcum").cast("bigint") + 1).alias("_hi"),
    )
    joined = interval_join_binned(
        tgt,
        ranks,
        bin_seconds=rank_bin,
        l_start="_t",
        l_end="_t2",
        r_start="_lo",
        r_end="_hi",
    )
    return joined.select(
        F.col("_g").alias(group_col),
        F.col("_v").alias(value_col),
        F.col("_w").alias("weight"),
        F.col("_mv_r").alias("mapped"),
    )
