"""Deterministic sampling / domain-mixing operators.

Training-data pipelines re-weight sources ("domain mixing": up/down-
sample web vs books vs code to target proportions) and need the result
to be REPRODUCIBLE across runs and unchanged for old rows when the
corpus grows. Both operators here are pure functions of a stable key —
no RNG, no seed bookkeeping — the same discipline as
``plans/llmprep.py``'s ``doc_train_split``.

Two physical strategies, chosen by what must be exact:

- :func:`keymod_sample` — keep a row iff ``key % buckets`` falls under
  the stratum's weight. Map-only (ZERO shuffle): at 100 TB this is the
  only shape that survives, because it needs no per-stratum counts. The
  kept fraction is approximate (exact as corpus -> inf, and exactly
  reproducible row-by-row).
- :func:`stratified_topn` — exact N per stratum via row_number. Costs
  one shuffle on the stratum key and serializes each stratum through
  one task, so it is for strata that fit a task (dashboards, eval
  slices), not whole-corpus mixing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def keymod_flag(
    key_col: str,
    weight: Column,
    buckets: int = 100,
) -> Column:
    """Boolean Column: ``key % buckets < round(weight * buckets)``.

    ``weight`` is a per-row Column in [0, 1] (typically a CASE over the
    stratum column encoding target mix proportions). Exposed separately
    from :func:`keymod_sample` so one-scan conditional aggregations
    (kept vs total in the same pass) can reuse the exact sampling rule.
    """
    thresh = F.round(weight * buckets).cast("bigint")
    return F.pmod(F.col(key_col), F.lit(buckets)) < thresh


def keymod_sample(
    df: DataFrame,
    key_col: str,
    weight: Column,
    buckets: int = 100,
) -> DataFrame:
    """Deterministic weighted sample: keep iff
    ``key % buckets < round(weight * buckets)``.

    Rows with weight 1.0 are always kept; 0.0 never. Pure
    projection+filter — pushes to the scan, no exchange anywhere.
    """
    return df.where(keymod_flag(key_col, weight, buckets))


def md5_global_order(
    df: DataFrame,
    key_col: str,
    rn_col: str = "rn",
    bucket_chars: int = 2,
) -> DataFrame:
    """Deterministic global shuffle order: 1-based position of every row
    under ``ORDER BY md5(key), key`` — WITHOUT a single-task global
    window.

    A naive ``row_number() OVER (ORDER BY ...)`` serializes the whole
    table through one task. Instead: the md5 hex prefix partitions the
    order (lexicographic prefix property), so

    1. count rows per prefix bucket (one shuffle down to 16^bucket_chars
       rows),
    2. prefix-sum those counts driver-side (tiny, deterministic) into
       per-bucket offsets,
    3. window per bucket (parallel across 256 buckets) + broadcast the
       offsets back.

    The expensive exchange is bucket-partitioned, i.e. 100 TB spreads
    over 16^bucket_chars ~independent sorts. This is the standard
    "shuffle the corpus reproducibly before sharding" step of a
    training-data pipeline: the order is a pure function of the stable
    key — no RNG state, stable under re-runs.
    """
    ord_key = F.md5(F.col(key_col).cast("string"))
    keyed = df.withColumn("_ok", ord_key).withColumn(
        "_bk", F.substring("_ok", 1, bucket_chars)
    )
    counts = keyed.groupBy("_bk").count().collect()
    offsets, acc = {}, 0
    for row in sorted(counts, key=lambda r: r["_bk"]):
        offsets[row["_bk"]] = acc
        acc += row["count"]
    spark = df.sparkSession
    off_df = spark.createDataFrame(
        [(b, o) for b, o in offsets.items()], "_bk string, _off bigint"
    )
    w = Window.partitionBy("_bk").orderBy("_ok", key_col)
    return (
        keyed.join(F.broadcast(off_df), "_bk")
        .withColumn(rn_col, F.row_number().over(w) + F.col("_off"))
        .drop("_ok", "_bk", "_off")
    )


def stratified_topn(
    df: DataFrame,
    strata_col: str,
    n: int,
    order_col: str,
) -> DataFrame:
    """Exactly the first ``n`` rows per stratum in ``order_col`` order.

    One shuffle on ``strata_col``; each stratum streams through a
    single task (use :func:`keymod_sample` for corpus-scale strata).
    """
    w = Window.partitionBy(strata_col).orderBy(order_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n)
        .drop("_rn")
    )
