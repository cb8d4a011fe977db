"""Exact weighted quantiles per group — two-phase, no global sort.

A training-data pipeline weights rows all the time (tokens per
document, quantity per line item, impressions per user); "the median
document" by count and by token mass are different documents. The
standard Spark answers are both wrong at scale: ``percentile_approx``
is approximate (and ignores weights), and an exact per-group window
sort funnels each group through one task — a 3-group corpus sorts a
third of 100 TB per task.

:func:`weighted_quantiles_exact` computes the exact lower weighted
quantile (smallest value v with den·cumweight(≤v) ≥ num·W) with the
grouped two-phase prefix sum: (1) one (group, value) hash aggregation
with map-side partials collapses the corpus to distinct values; (2)
per-(group, bucket) weight totals get a cumulative offset via a window
over the BOUNDED bucket-count relation (partitioned by group, ordered
by bucket — each task sees O(#buckets) rows, never data); (3) a
parallel per-(group, bucket) running sum finishes the cumulative
weight. Quantile selection is then a conditional MIN per group — an
aggregation, not a sort. Weights are exact bigints, the threshold test
``den·cum ≥ num·W`` is integer arithmetic on decimal(38,0) (no float
rank), so the selected value is deterministic at any partition order
and bit-identical across engines.

Reference analog: none — the reference's pandas ``median()`` is
unweighted and single-node (streamlit/pages/price_analysis.py).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def grouped_bucketed_running_sum(
    df: DataFrame,
    group_cols: Sequence[str],
    bucket: Column,
    order_cols: Sequence[Column],
    val: Column,
    sum_col: str = "cum",
) -> DataFrame:
    """Per-group running ``SUM(val) OVER (PARTITION BY group ORDER BY
    order_cols)`` without a per-group single-task sort — the grouped
    twin of ``operators/sampling.bucketed_running_sum``.

    ``bucket`` must be NON-NULL and order-aligned with ``order_cols``
    within every group. The offset window partitions by group and
    orders by bucket over the per-(group, bucket) TOTALS relation
    (bounded by |groups|·|buckets|); the inner window partitions by
    (group, bucket) — both hash-partitioned, neither ever holds a
    group's full data in one task. Pass a DECIMAL ``val`` for exact
    accumulation.
    """
    gc = list(group_cols)
    keyed = df.withColumn("_bk", bucket).withColumn("_val", val)
    totals = keyed.groupBy(*gc, "_bk").agg(F.sum("_val").alias("_tot"))
    wcum = (
        Window.partitionBy(*gc)
        .orderBy("_bk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = totals.select(
        *gc,
        "_bk",
        F.coalesce(
            F.sum("_tot").over(wcum), F.lit(0).cast("decimal(38,6)")
        ).alias("_off"),
    )
    w = (
        Window.partitionBy(*gc, "_bk")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        keyed.join(offs, [*gc, "_bk"])
        .withColumn(sum_col, F.sum("_val").over(w) + F.col("_off"))
        .drop("_bk", "_off", "_val")
    )


def weighted_quantiles_exact(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    weight_col: str,
    quantiles: Sequence[tuple[int, int]] = ((1, 4), (1, 2), (3, 4)),
    bucket: Column | None = None,
) -> DataFrame:
    """Per group: ``(group_cols..., n_rows, total_weight, q_<num>_<den>
    ...)`` — exact lower weighted quantiles.

    ``q_num_den`` is the smallest value v whose cumulative weight
    satisfies ``den·cum(≤v) ≥ num·W`` (the lower weighted quantile;
    num/den must be in (0, 1]). ``weight_col`` must be bigint-exact
    (cast integer-valued doubles first); NULL values or weights are
    excluded. ``bucket`` defaults to ``floor(value)`` — pass e.g.
    ``floor(col/1000)`` to keep the bucket domain bounded for wide
    ranges.
    """
    gc = list(group_cols)
    v = F.col(value_col)
    w = F.col(weight_col).cast("bigint")
    g = (
        df.where(v.isNotNull() & w.isNotNull())
        .groupBy(*gc, v.alias("_v"))
        .agg(
            F.sum(w).alias("_w"),
            F.count("*").cast("bigint").alias("_cnt"),
        )
    )
    bk = F.floor(F.col("_v")).cast("bigint") if bucket is None else bucket
    cum = grouped_bucketed_running_sum(
        g,
        gc,
        bucket=bk,
        order_cols=[F.col("_v")],
        val=F.col("_w").cast("decimal(38,6)"),
        sum_col="_cum",
    )
    totals = g.groupBy(*gc).agg(
        F.sum("_w").cast("decimal(38,0)").alias("_tw"),
        F.sum("_cnt").cast("bigint").alias("_n"),
    )
    # Empty group list = one global quantile: totals is a single row,
    # so fold it in as a 1-row broadcast (a keyless join would plan a
    # CartesianProduct, which the scale audit rightly bans).
    j = cum.join(F.broadcast(totals)) if not gc else cum.join(totals, gc)
    c = F.col("_cum").cast("decimal(38,0)")
    aggs = [
        F.max("_n").alias("n_rows"),
        F.max("_tw").cast("bigint").alias("total_weight"),
    ]
    for num, den in quantiles:
        if not 0 < num <= den:
            raise ValueError(f"quantile {num}/{den} outside (0, 1]")
        aggs.append(
            F.min(
                F.when(c * den >= F.col("_tw") * num, F.col("_v"))
            ).alias(f"q_{num}_{den}")
        )
    return j.groupBy(*gc).agg(*aggs)
