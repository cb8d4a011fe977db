"""Incremental view maintenance: keep a grouped aggregate current by
applying a CDC diff instead of recomputing from the full snapshot.

At 100 TB the difference is the whole story: refreshing a dashboard
aggregate by rescan costs a full fact-table pass per refresh, while
the incremental path costs O(|changes|) — the classic delta-rule IVM
for distributive aggregates (count / sum, with avg derived as
sum/cnt). The delta feed is exactly what :func:`operators.cdc.
table_diff` (or a lakehouse change-data-feed scan) emits: keyed rows
classified insert/delete/update with pre/post images.

Mechanics: every diff row becomes up to two SIGNED contributions —
``(-1, -old measures)`` at the OLD group key for deletes and updates,
``(+1, +new measures)`` at the NEW group key for inserts and updates —
so an update that MOVES a row between groups (the case naive
"aggregate the diff" schemes get wrong) debits one group and credits
the other. The signed deltas aggregate down to one row per touched
group, union with the stored aggregate, and re-combine; groups whose
count reaches zero disappear, exactly as a recompute would drop them.

Plan shape: the fact table is never read. One groupBy over the (small)
diff, one union with the (small) stored aggregate, one final groupBy
on the group key — three narrow shuffles over aggregate-sized data.
``incremental_agg(summing_agg(v1), table_diff(v1, v2)) ==
summing_agg(v2)`` is pinned property-based in tests/test_ivm.py and
cross-engine by the ``orders_priority_agg_ivm`` oracle (DuckDB
recomputes from the new snapshot; Spark never sees it whole).

Exactness: sums must ride an associative, order-independent type —
pass DECIMAL measures (functions/core.py policy). NULL measures
contribute 0 to sums on both the base and the delta path (documented
divergence from SQL's all-NULL-group ⇒ NULL sum; the alternative
would track per-group non-null counts for no modeled benefit).

Reference analog: none — the reference recomputes every dashboard
aggregate from a full table read per page load
(streamlit/utils/data_loader.py); this operator is the scale answer.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_mudah_spark.operators.cdc import CHANGE_COL


def summing_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    sum_cols: Mapping[str, str],
    cnt_col: str = "cnt",
) -> DataFrame:
    """The maintainable aggregate shape: per group, a row count plus
    one sum per ``{output_name: source_col}`` entry (NULLs as 0 — see
    module docstring). Build the base with this and refresh it with
    :func:`incremental_agg`; both produce the same schema, so a
    refreshed aggregate can itself be refreshed again."""
    aggs = [F.count("*").alias(cnt_col)] + [
        F.sum(F.coalesce(F.col(src), F.lit(0))).alias(out)
        for out, src in sum_cols.items()
    ]
    return df.groupBy(*group_cols).agg(*aggs)


def incremental_agg(
    agg_old: DataFrame,
    diff: DataFrame,
    group_cols: Sequence[str],
    sum_cols: Mapping[str, str],
    cnt_col: str = "cnt",
) -> DataFrame:
    """Apply a :func:`operators.cdc.table_diff`-shaped ``diff`` (with
    images; the group and measure columns must be among the compared
    columns) to ``agg_old`` (a :func:`summing_agg` result), returning
    the aggregate of the NEW snapshot without reading it."""
    groups = list(group_cols)

    def side(prefix: str, sign: int, excluded_change: str) -> DataFrame:
        cols = [F.col(f"{prefix}_{g}").alias(g) for g in groups]
        cols.append(F.lit(sign).alias("_d_cnt"))
        for out, src in sum_cols.items():
            m = F.coalesce(F.col(f"{prefix}_{src}"), F.lit(0))
            cols.append((F.lit(sign) * m).alias(f"_d_{out}"))
        return diff.where(F.col(CHANGE_COL) != excluded_change).select(*cols)

    deltas = side("old", -1, "insert").unionByName(side("new", +1, "delete"))
    delta_agg = deltas.groupBy(*groups).agg(
        F.sum("_d_cnt").alias(cnt_col),
        *[F.sum(f"_d_{out}").alias(out) for out in sum_cols],
    )
    combined = agg_old.select(
        *groups, cnt_col, *sum_cols
    ).unionByName(delta_agg.select(*groups, cnt_col, *sum_cols))
    return (
        combined.groupBy(*groups)
        .agg(
            F.sum(cnt_col).alias(cnt_col),
            *[F.sum(out).alias(out) for out in sum_cols],
        )
        .where(F.col(cnt_col) > 0)
    )
