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
