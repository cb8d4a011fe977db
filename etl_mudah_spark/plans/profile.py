"""Table profiling and reshape queries.

- ``lineitem_unpivot_metrics``: wide→long melt (the inverse of
  orders_pivot_status in plans/parity.py) via the native ``unpivot``
  operator, then a grouped summary. Unpivot is a zero-shuffle
  projection (each row expands to k rows in place); the only exchange
  is the final small agg.
- ``lineitem_profile``: per-column data-profiling summary (count,
  nulls, distinct, min/max/avg) of the kind every ingestion pipeline
  runs before accepting a batch. One pass over the table: all
  aggregates compute in a single partial-agg scan (no per-column
  jobs, unlike naive df.summary() usage patterns); distinct counts
  are exact here — at 100 TB swap in approx_count_distinct(rsd) and
  accept the documented error bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_mudah_spark.functions.core import oracle_dsum
from etl_mudah_spark.plans.registry import register
from etl_mudah_spark.tables import load


@register(
    "lineitem_unpivot_metrics",
    oracle=f"""
    WITH long AS (
        SELECT l_returnflag, 'quantity' AS metric, l_quantity AS value FROM lineitem
        UNION ALL
        SELECT l_returnflag, 'extendedprice', l_extendedprice FROM lineitem
        UNION ALL
        SELECT l_returnflag, 'discount', l_discount FROM lineitem
    )
    SELECT l_returnflag, metric,
           COUNT(*) AS cnt,
           {oracle_dsum('value')} AS total
    FROM long
    GROUP BY l_returnflag, metric
    """,
    doc="Wide→long unpivot (melt) + grouped totals per metric.",
)
def lineitem_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ids=["l_returnflag"],
        values=["l_quantity", "l_extendedprice", "l_discount"],
        variableColumnName="metric",
        valueColumnName="value",
    ).withColumn(
        # Column names → the oracle's metric labels.
        "metric",
        F.element_at(
            F.create_map(
                F.lit("l_quantity"), F.lit("quantity"),
                F.lit("l_extendedprice"), F.lit("extendedprice"),
                F.lit("l_discount"), F.lit("discount"),
            ),
            F.col("metric"),
        ),
    )
    return long.groupBy("l_returnflag", "metric").agg(
        F.count("*").alias("cnt"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total"),
    )


_PROFILE_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


@register(
    "lineitem_profile",
    oracle="""
    SELECT 'l_quantity' AS column_name, COUNT(*) AS n_rows,
           COUNT(*) - COUNT(l_quantity) AS n_nulls,
           COUNT(DISTINCT l_quantity) AS n_distinct,
           CAST(MIN(l_quantity) AS DOUBLE) AS min_val,
           CAST(MAX(l_quantity) AS DOUBLE) AS max_val,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(l_quantity) AS avg_val
    FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', COUNT(*), COUNT(*) - COUNT(l_extendedprice),
           COUNT(DISTINCT l_extendedprice),
           CAST(MIN(l_extendedprice) AS DOUBLE), CAST(MAX(l_extendedprice) AS DOUBLE),
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(l_extendedprice)
    FROM lineitem
    UNION ALL
    SELECT 'l_discount', COUNT(*), COUNT(*) - COUNT(l_discount),
           COUNT(DISTINCT l_discount),
           CAST(MIN(l_discount) AS DOUBLE), CAST(MAX(l_discount) AS DOUBLE),
           CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(l_discount)
    FROM lineitem
    UNION ALL
    SELECT 'l_tax', COUNT(*), COUNT(*) - COUNT(l_tax),
           COUNT(DISTINCT l_tax),
           CAST(MIN(l_tax) AS DOUBLE), CAST(MAX(l_tax) AS DOUBLE),
           CAST(SUM(CAST(l_tax AS DECIMAL(18,6))) AS DOUBLE) / COUNT(l_tax)
    FROM lineitem
    """,
    doc="Per-column profile (count/nulls/distinct/min/max/avg) in one scan.",
)
def lineitem_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count("*").alias(f"{c}__n_rows"),
            (F.count("*") - F.count(c)).alias(f"{c}__n_nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__n_distinct"),
            F.min(c).cast("double").alias(f"{c}__min_val"),
            F.max(c).cast("double").alias(f"{c}__max_val"),
            (F.sum(F.col(c).cast("decimal(18,6)")).cast("double") / F.count(c)).alias(
                f"{c}__avg_val"
            ),
        ]
    wide = li.agg(*aggs)
    # One wide row → k profile rows: stack the per-column structs.
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col(f"{c}__n_rows").alias("n_rows"),
                F.col(f"{c}__n_nulls").alias("n_nulls"),
                F.col(f"{c}__n_distinct").alias("n_distinct"),
                F.col(f"{c}__min_val").alias("min_val"),
                F.col(f"{c}__max_val").alias("max_val"),
                F.col(f"{c}__avg_val").alias("avg_val"),
            )
            for c in _PROFILE_COLS
        ]
    )
    return wide.select(F.explode(entries).alias("p")).select("p.*")
