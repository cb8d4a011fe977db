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
