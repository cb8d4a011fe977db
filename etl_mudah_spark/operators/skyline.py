"""2-D Pareto frontier (skyline) without an all-pairs dominance join.

The skyline of (minimize x, maximize y) — rows no other row beats on
both axes — is textbook-defined by a quadratic NOT EXISTS self-join
(exactly what the registered query's DuckDB oracle runs). At 100 TB
that theta-join is unrunnable; but in 2-D the frontier has a sweep
characterization that is pure aggregation + prefix-max:

    a point (x, ymax_x) is on the frontier  ⇔  ymax_x > max{ymax_x' : x' < x}

(rows below their x's own ymax are dominated at equal x; an x whose
ymax only TIES an earlier x's is dominated by the earlier point's
strictly smaller x). So the plan is: one groupBy x, then a running
strict-prefix max over the x order — computed with the same two-phase
bucketed trick as ``sampling.bucketed_global_rank`` so no single task
ever sorts the full x domain: per-bucket maxima (one tiny aggregate),
a prefix window over the O(#buckets) aggregate rows, and a
bucket-partitioned parallel window for the within-bucket prefix.

Scale shape: two exchanges over the per-x aggregate (itself the output
of one map-side-combinable groupBy over the data), zero theta-joins,
zero UDFs. Generalizes to d>2 only as a pre-filter (the sweep argument
is 2-D); for d-dim skylines compose this per axis pair or fall back to
partitioned block-nested dominance with pruning.

Reference analog: none — beyond-reference analytics (the "best
price-for-size" / "cheapest at quality" query every marketplace
dashboard wants), SURVEY §2 extension family.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def pareto_frontier_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bucket: Callable[[Column], Column],
    n_col: str = "n_rows",
) -> DataFrame:
    """Frontier POINTS of (minimize ``x_col``, maximize ``y_col``):
    one row per frontier (x, y) with ``n_col`` = how many input rows
    sit exactly on that point (coincident rows all survive — they
    dominate each other in neither dimension).

    ``bucket`` is a pure function Column -> Column giving a non-null
    order-preserving coarsening of x (e.g. ``lambda c: F.floor(c)``) —
    the same contract as ``bucketed_global_rank``, and for the same
    reason: the strict prefix max runs per bucket in parallel, with
    bucket-level prefix maxima combined from the O(#buckets) aggregate
    relation. A callable (not a prebuilt Column) because the prefix
    pass evaluates it on the AGGREGATED x alias, not the input column.

    NULL contract: rows with a NULL x or y are EXCLUDED up front
    (filtered explicitly below). SQL three-valued dominance would keep
    a NULL-y row as vacuously undominated — a meaningless answer; a
    caller who wants NULLs ranked must coalesce them to a sentinel
    first. All comparisons run in y's NATIVE type (no double
    widening), so bigint/decimal y columns keep full precision — a
    double cast would merge values that differ past 2^53.
    """
    per_xy = (
        df.select(F.col(x_col).alias("_x"), F.col(y_col).alias("_y"))
        .where(F.col("_x").isNotNull() & F.col("_y").isNotNull())
        .groupBy("_x", "_y")
        .agg(F.count("*").alias(n_col))
    )
    per_x = per_xy.groupBy("_x").agg(F.max("_y").alias("_ymax")).withColumn(
        "_bk", bucket(F.col("_x"))
    )
    # bucket-level maxima -> strict prefix over PRECEDING buckets only
    # (window over the aggregate relation, bounded by the bucket domain)
    bmax = per_x.groupBy("_bk").agg(F.max("_ymax").alias("_bmax"))
    wb = W.orderBy("_bk").rowsBetween(W.unboundedPreceding, -1)
    boffs = bmax.select("_bk", F.max("_bmax").over(wb).alias("_prev_bmax"))
    # within-bucket strict prefix max, in parallel per bucket.
    # F.greatest skips NULLs, so the prefix stays native-typed with no
    # -inf sentinel; a NULL prefix means "nothing before me".
    wx = W.partitionBy("_bk").orderBy("_x").rowsBetween(W.unboundedPreceding, -1)
    ranked = (
        per_x.join(F.broadcast(boffs), "_bk")
        .withColumn("_prev_in_bk", F.max("_ymax").over(wx))
        .withColumn(
            "_prefix", F.greatest(F.col("_prev_bmax"), F.col("_prev_in_bk"))
        )
    )
    frontier_x = ranked.where(
        F.col("_prefix").isNull() | (F.col("_ymax") > F.col("_prefix"))
    ).select("_x", F.col("_ymax").alias("_y"))
    # n_rows comes from the ALREADY-GROUPED per-(x, y) relation — no
    # second scan of df, and no forced broadcast: a correlated frontier
    # can be O(#distinct x) rows, so the join strategy is left to the
    # planner.
    return frontier_x.join(per_xy, ["_x", "_y"]).select(
        F.col("_x").alias(x_col), F.col("_y").alias(y_col), n_col
    )
