"""Slowly-changing-dimension (SCD type 2) history collapse.

The ETL pattern the merge/upsert surface (operators/merge.py) does not
cover: instead of overwriting a dimension row in place (SCD1 — what
merge_upsert does), keep every historical VERSION with a validity
interval. The input is a change feed (or any per-key event log ordered
by time); the output is one row per run of identical tracked
attributes: ``(key, attrs, version, valid_from, valid_to)`` with
``valid_to`` NULL on the current version — the standard
as-of-joinable dimension history.

Collapse = gaps-and-islands per key: a version boundary is any row
whose tracked attributes differ (null-safely) from the previous row's;
the version number is the running count of boundaries. Both windows
partition by the business key — no global window, so a 100 TB change
log spreads across keys exactly like any keyed aggregation. This is
deliberately a pure DataFrame transform (log in, history out): writing
the result is the caller's choice of sink, and re-running on a grown
log reproduces the same history (deterministic given the
``ts_col``/tiebreak ordering, no state carried between runs).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_collapse(
    df: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    ts_col: str,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Collapse a per-key change log into SCD2 version history.

    Returns one row per (key, version): the tracked ``attr_cols``
    values, ``valid_from`` (first ``ts_col`` of the run), ``valid_to``
    (next version's valid_from; NULL for the open/current version) and
    ``n_rows`` (log rows collapsed into the version). Ordering within
    a key is ``(ts_col, *tiebreak_cols)`` — pass a unique tiebreak for
    a deterministic history when timestamps can tie.
    """
    order = [F.col(ts_col).asc()] + [
        F.col(c).asc() for c in (tiebreak_cols or [])
    ]
    w = Window.partitionBy(*key_cols).orderBy(*order)

    def same(c: str) -> Column:
        return F.col(c).eqNullSafe(F.lag(c).over(w))

    unchanged = reduce(lambda a, b: a & b, (same(c) for c in attr_cols))
    # A key's first row is always a boundary — and it must be detected
    # explicitly: if its attrs are NULL, eqNullSafe(NULL, lag=NULL)
    # would read as "unchanged" and the whole first run would get
    # version 0. lag over a constant is NULL exactly on the first row.
    first_row = F.lag(F.lit(1)).over(w).isNull()
    boundary = F.when(first_row | ~unchanged, 1).otherwise(0)
    versioned = df.withColumn(
        "version",
        F.sum(boundary)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("int"),
    )
    runs = versioned.groupBy(*key_cols, "version").agg(
        *[F.first(c).alias(c) for c in attr_cols],
        F.min(ts_col).alias("valid_from"),
        F.count("*").cast("bigint").alias("n_rows"),
    )
    w_next = Window.partitionBy(*key_cols).orderBy("version")
    return runs.withColumn(
        "valid_to", F.lead("valid_from").over(w_next)
    ).select(*key_cols, "version", *attr_cols, "valid_from", "valid_to", "n_rows")
