"""As-of (temporal) join — a primitive vanilla Spark lacks.

``asof_join_backward(left, right, ...)`` attaches, to every left row,
the value columns of the most recent right row with the same key and
``right_ts <= left_ts`` (the classic "price as of trade time" join;
DuckDB spells it ``ASOF JOIN``, pandas ``merge_asof``).

Implementation is the union + running-window form, NOT a range join:

    union(left tagged 1, right tagged 0)
      → window partitionBy(key) orderBy(ts, tag)
      → last(value, ignorenulls=True) over rows unbounded-preceding..current
      → keep left rows

Scale rationale: one shuffle on the key, linear scan per key group, no
pair blow-up — at 100 TB an inequality join would either explode
(sort-merge on key with ts-range residual ≈ per-key cross product) or
not distribute at all (nested loop). The union form's cost is exactly
one sort-shuffle of |left| + |right| rows, the same shape as any
windowed query. Right rows sort BEFORE left rows at equal timestamps
(tag 0 < 1), so an exactly-simultaneous right row IS matched
(inclusive semantics, same as DuckDB ASOF).

Divergence from SQL ASOF: if a matched right row has a NULL value
column, ``last(ignorenulls)`` falls back to the previous non-null right
row instead of returning NULL. For non-null payloads (the common case)
the results are identical.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: latest ``right`` row per key with ts <= left ts.

    Returns every ``left`` row plus ``{v}{suffix}`` for each value col
    (NULL when no prior right row exists).
    """
    rtypes = dict(right.dtypes)
    lrow = F.struct(*[F.col(c) for c in left.columns]).alias("_lrow")
    l = left.select(
        *[F.col(k) for k in key_cols],
        F.col(left_ts).alias("_ats"),
        F.lit(1).alias("_tag"),
        lrow,
        *[F.lit(None).cast(rtypes[c]).alias(f"_rv_{c}") for c in value_cols],
    )
    lrow_type = l.schema["_lrow"].dataType
    r = right.select(
        *[F.col(k) for k in key_cols],
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_tag"),
        F.lit(None).cast(lrow_type).alias("_lrow"),
        *[F.col(c).alias(f"_rv_{c}") for c in value_cols],
    )
    w = (
        W.partitionBy(*key_cols)
        .orderBy(F.asc("_ats"), F.asc("_tag"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = l.unionByName(r).select(
        "_tag",
        "_lrow",
        *[
            F.last(f"_rv_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in value_cols
        ],
    )
    return filled.where(F.col("_tag") == 1).select(
        "_lrow.*", *[f"{c}{suffix}" for c in value_cols]
    )
