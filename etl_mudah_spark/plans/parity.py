"""Reference-parity queries (SURVEY.md §2) over the star-schema testdata.

Each query re-expresses one operator family from the reference app
(file:line citations into /root/reference/) on the driver's TPC-H-ish
tables, with a DuckDB oracle twin. DataFrame-API plans — Catalyst gets
pushdown / pruning / join selection; hints (broadcast) only where a
dimension is broadcast-safe at any scale factor.

Float determinism policy (see functions/core.py): exact decimal sums
cast to double, raw IEEE divisions, and NO round() on deterministic
values — round(…, 4) only on algorithm-dependent aggregates (corr,
stddev, interpolated quantiles), whose values almost surely avoid
decimal boundaries.

Scale notes are inline per query: what shuffles, what broadcasts, what
the plan looks like at 1000 executors / 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from etl_mudah_spark.functions.core import (
    bucket_case,
    capitalize,
    davg,
    dsum,
    fixed_width_bin,
    oracle_davg,
    oracle_dsum,
    share_pct,
)
from etl_mudah_spark.operators import dedup as dd
from etl_mudah_spark.operators import sampling as smp
from etl_mudah_spark.plans.registry import register
from etl_mudah_spark.tables import load

# Price-segment thresholds/labels: analog of the car segments at
# reference streamlit/utils/constants.py:26-36, applied to o_totalprice.
SEG_THRESHOLDS = [25_000.0, 50_000.0, 100_000.0, 200_000.0]
SEG_LABELS = ["Budget", "Economy", "Mid-Range", "Premium", "Luxury"]

_SEG_SQL = """
    CASE WHEN o_totalprice < 25000 THEN 'Budget'
         WHEN o_totalprice < 50000 THEN 'Economy'
         WHEN o_totalprice < 100000 THEN 'Mid-Range'
         WHEN o_totalprice < 200000 THEN 'Premium'
         ELSE 'Luxury' END
"""


# ---------------------------------------------------------------------------
# Flagship: grouped multi-aggregate scan (TPC-H Q1 shape).
# Reference analog: the dashboard's grouped metric tiles (A1/A3,
# streamlit/app.py:84-92, pages/price_analysis.py:43-47).
# Scale: single scan + partial hash-agg before one shuffle on a
# 6-value key space → trivially 100 TB-safe (map-side combine does
# ~all the work; final agg is 6 rows).
# ---------------------------------------------------------------------------
@register(
    "pricing_summary",
    oracle="""
    WITH g AS (
        SELECT l_returnflag, l_linestatus, l_discount, l_tax,
               SUM(CAST(l_quantity AS DECIMAL(8,2))) AS sq,
               SUM(CAST(l_extendedprice AS DECIMAL(8,2))) AS sp,
               SUM(CAST(l_discount AS DECIMAL(8,2))) AS sd,
               COUNT(*) AS n
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1999-09-02'
        GROUP BY 1, 2, 3, 4
    )
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(sq) AS DOUBLE) AS sum_qty,
           CAST(SUM(sp) AS DOUBLE) AS sum_base_price,
           CAST(SUM(sp * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
               AS sum_disc_price,
           CAST(SUM(sp * (1 - CAST(l_discount AS DECIMAL(4,2)))
                       * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE)
               AS sum_charge,
           CAST(SUM(sq) AS DOUBLE) / SUM(n) AS avg_qty,
           CAST(SUM(sp) AS DOUBLE) / SUM(n) AS avg_price,
           CAST(SUM(sd) AS DOUBLE) / SUM(n) AS avg_disc,
           CAST(SUM(n) AS BIGINT) AS count_order
    FROM g
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="Grouped multi-aggregate over the fact table (TPC-H Q1 shape).",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1, FACTORIZED over the finite measure domains (round-10
    x100 decomposition, BASELINE.md): discount and tax take ~11 x ~9
    distinct 2-dp values, so phase 1 groups by (flag, status, discount,
    tax) — a few hundred groups, fully map-side combined — with only
    COMPACT decimal(8,2) sums (long-backed buffers in codegen; see
    functions/core.py dsum2). Phase 2 applies the (1-d), (1+t) products
    to the ~600 EXACT partial sums in full-precision decimal, so the
    result is the exact-arithmetic Q1 answer: Σ p·(1-d)·(1+t) =
    Σ_{{d,t}} (1-d)·(1+t)·Σp, with zero per-row BigDecimal work.

    Measured at the x100 staged point: 2.9 s vs 6.4 s for the direct
    per-row decimal(18,6) lattice (scan+count floor 0.8 s, plain
    double sums 1.1 s, DuckDB's int128 decimal engine 0.4 s). At
    100 TB the factorization also shrinks the shuffle: partial rows
    per task are bounded by the (flag, status, d, t) domain product,
    not by data."""
    li = load(spark, sf_dir, "lineitem")
    s = lambda c: F.sum(F.col(c).cast("decimal(8,2)"))  # noqa: E731
    g1 = (
        li.where(F.col("l_shipdate") <= F.lit("1999-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus", "l_discount", "l_tax")
        .agg(
            s("l_quantity").alias("sq"),
            s("l_extendedprice").alias("sp"),
            s("l_discount").alias("sd"),
            F.count("*").alias("n"),
        )
    )
    d2 = F.col("l_discount").cast("decimal(4,2)")
    t2 = F.col("l_tax").cast("decimal(4,2)")
    return g1.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("sq").cast("double").alias("sum_qty"),
        F.sum("sp").cast("double").alias("sum_base_price"),
        F.sum(F.col("sp") * (1 - d2)).cast("double").alias("sum_disc_price"),
        F.sum(F.col("sp") * (1 - d2) * (1 + t2))
        .cast("double")
        .alias("sum_charge"),
        (F.sum("sq").cast("double") / F.sum("n")).alias("avg_qty"),
        (F.sum("sp").cast("double") / F.sum("n")).alias("avg_price"),
        (F.sum("sd").cast("double") / F.sum("n")).alias("avg_disc"),
        F.sum("n").alias("count_order"),
    )


# ---------------------------------------------------------------------------
# A2 + D6: frequency count + deterministic top-k.
# Reference: value_counts().head(10) on make (market_overview.py:34).
# Scale: partial count before shuffle; TakeOrdered(10) — no full sort.
# ---------------------------------------------------------------------------
@register(
    "top_brands",
    oracle="""
    SELECT p_brand, COUNT(*) AS cnt
    FROM part
    GROUP BY p_brand
    ORDER BY cnt DESC, p_brand ASC
    LIMIT 10
    """,
    doc="Top-10 brands by part count, deterministic tie-break.",
)
def top_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "part")
        .groupBy("p_brand")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("p_brand"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# A13: re-aggregation of an aggregate (top-3 share of total).
# Reference: market_overview.py:59,79-84.
# ---------------------------------------------------------------------------
@register(
    "brand_share",
    oracle="""
    WITH counts AS (
        SELECT p_brand, COUNT(*) AS cnt FROM part GROUP BY p_brand
    ), top3 AS (
        SELECT cnt FROM counts ORDER BY cnt DESC, p_brand ASC LIMIT 3
    )
    SELECT CAST((SELECT SUM(cnt) FROM top3) AS BIGINT) AS top3_cnt,
           CAST((SELECT SUM(cnt) FROM counts) AS BIGINT) AS total_cnt,
           (100.0 * (SELECT SUM(cnt) FROM top3))
               / (SELECT SUM(cnt) FROM counts) AS top3_share_pct
    """,
    doc="Share of total held by the top-3 brands (agg over agg).",
)
def brand_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    counts = (
        load(spark, sf_dir, "part").groupBy("p_brand").agg(F.count("*").alias("cnt"))
    )
    top3 = counts.orderBy(F.desc("cnt"), F.asc("p_brand")).limit(3)
    # Aggregate frames are tiny (≤ #brands rows) at ANY sf — a cross join
    # of two 1-row aggregates is driver-trivial and cluster-safe.
    t3 = top3.agg(F.sum("cnt").cast("bigint").alias("top3_cnt"))
    tot = counts.agg(F.sum("cnt").cast("bigint").alias("total_cnt"))
    return t3.crossJoin(tot).select(
        "top3_cnt",
        "total_cnt",
        ((100.0 * F.col("top3_cnt")) / F.col("total_cnt")).alias("top3_share_pct"),
    )


# ---------------------------------------------------------------------------
# F4 + A9: piecewise CASE bucketing + per-bucket distribution.
# Reference: create_price_segment (constants.py:26-36) + range counts
# (price_analysis.py:259-272) — one pass, no loop.
# ---------------------------------------------------------------------------
@register(
    "price_segments",
    oracle=f"""
    SELECT {_SEG_SQL} AS segment,
           COUNT(*) AS cnt,
           {oracle_dsum('o_totalprice')} AS total_value,
           (100.0 * COUNT(*)) / (SELECT COUNT(*) FROM orders) AS share_pct
    FROM orders
    GROUP BY 1
    """,
    doc="Named price segments via CASE chain, with counts and shares.",
)
def price_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The global total folds in as a 1-row broadcast crossJoin (the
    # nation_acctbal_concentration pattern) — one Spark job, not an
    # eager .count() round-trip plus a second job.
    orders = load(spark, sf_dir, "orders")
    total = orders.agg(F.count("*").alias("_total"))
    return (
        orders.withColumn("segment", bucket_case("o_totalprice", SEG_THRESHOLDS, SEG_LABELS))
        .groupBy("segment")
        .agg(
            F.count("*").alias("cnt"),
            dsum("o_totalprice").alias("total_value"),
        )
        .join(F.broadcast(total))
        .withColumn("share_pct", (100.0 * F.col("cnt")) / F.col("_total"))
        .drop("_total")
    )


# ---------------------------------------------------------------------------
# A3 + F2: grouped stats over a derived time key (depreciation-curve shape).
# Reference: groupby('age') agg mean/median/count (price_analysis.py:43-47).
# ---------------------------------------------------------------------------
@register(
    "order_year_stats",
    oracle=f"""
    SELECT CAST(year(o_orderdate) AS INT) AS order_year,
           COUNT(*) AS cnt,
           {oracle_davg('o_totalprice')} AS avg_price,
           ROUND(MEDIAN(o_totalprice), 4) AS median_price
    FROM orders
    GROUP BY 1
    """,
    doc="Count/avg/median of order value per order year.",
)
def order_year_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .groupBy(F.year("o_orderdate").cast("int").alias("order_year"))
        .agg(
            F.count("*").alias("cnt"),
            davg("o_totalprice").alias("avg_price"),
            F.round(F.median("o_totalprice"), 4).alias("median_price"),
        )
    )


# ---------------------------------------------------------------------------
# P6 + P7 + A1: interactive filter stack → scalar metric tile aggs.
# Reference: app.py:75-92 (between(price) ∧ between(year) ∧ isin(makes)
# → count/mean/median).
# ---------------------------------------------------------------------------
@register(
    "filter_stack_metrics",
    oracle=f"""
    SELECT COUNT(*) AS cnt,
           {oracle_davg('o_totalprice')} AS avg_price,
           ROUND(MEDIAN(o_totalprice), 4) AS median_price,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price
    FROM orders
    WHERE o_totalprice BETWEEN 10000 AND 300000
      AND year(o_orderdate) BETWEEN 1996 AND 1999
      AND o_orderpriority IN ('1-URGENT', '2-HIGH')
    """,
    doc="BETWEEN + IN-list filter stack feeding scalar aggregates.",
)
def filter_stack_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .where(
            F.col("o_totalprice").between(10_000, 300_000)
            & F.year("o_orderdate").between(1996, 1999)
            & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        )
        .agg(
            F.count("*").alias("cnt"),
            davg("o_totalprice").alias("avg_price"),
            F.round(F.median("o_totalprice"), 4).alias("median_price"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
    )


# ---------------------------------------------------------------------------
# P5 + P8: regex predicate + case-insensitive substring search.
# Reference: year ~ '^[0-9]{4}$' (data_loader.py:28), brand search box
# (app.py:55-59).
# ---------------------------------------------------------------------------
@register(
    "regex_and_search",
    oracle="""
    SELECT p_brand, COUNT(*) AS cnt
    FROM part
    WHERE regexp_matches(p_type, '^(ECONOMY|PROMO)')
      AND contains(lower(p_name), 'a')
    GROUP BY p_brand
    """,
    doc="rlike prefix regex + lower/contains substring filter.",
)
def regex_and_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "part")
        .where(F.col("p_type").rlike("^(ECONOMY|PROMO)"))
        .where(F.lower(F.col("p_name")).contains("a"))
        .groupBy("p_brand")
        .agg(F.count("*").alias("cnt"))
    )


# ---------------------------------------------------------------------------
# A14: distinct values, sorted (make/model pickers).
# Reference: sorted(df['make'].unique()) at app.py:53.
# ---------------------------------------------------------------------------
@register(
    "distinct_priorities",
    oracle="SELECT DISTINCT o_orderpriority FROM orders ORDER BY o_orderpriority",
    doc="Sorted distinct value list.",
)
def distinct_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderpriority")
        .distinct()
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# A10: Pearson correlation as an aggregate.
# Reference: df['age'].corr(df['price']) at market_overview.py:196.
# ---------------------------------------------------------------------------
@register(
    "qty_price_corr",
    oracle="""
    SELECT ROUND(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
           COUNT(*) AS cnt
    FROM lineitem
    """,
    doc="Pearson correlation between two measures (sample corr).",
)
def qty_price_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "lineitem").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        F.count("*").alias("cnt"),
    )


# ---------------------------------------------------------------------------
# A12: quartiles per group (box-plot stats).
# Reference: px.box per model (price_analysis.py:296-302) → exact
# interpolated quantiles in both engines, rounded to 4 (interpolated
# values sit on the 2-decimal grid, never on the 4-decimal boundary).
# ---------------------------------------------------------------------------
@register(
    "brand_quartiles",
    oracle="""
    SELECT p_brand,
           ROUND(quantile_cont(p_retailprice, 0.25), 4) AS q1,
           ROUND(quantile_cont(p_retailprice, 0.50), 4) AS q2,
           ROUND(quantile_cont(p_retailprice, 0.75), 4) AS q3,
           COUNT(*) AS cnt
    FROM part
    GROUP BY p_brand
    """,
    doc="Exact per-group quartiles (linear interpolation).",
)
def brand_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "part")
        .groupBy("p_brand")
        .agg(
            F.round(F.percentile("p_retailprice", F.lit(0.25)), 4).alias("q1"),
            F.round(F.percentile("p_retailprice", F.lit(0.50)), 4).alias("q2"),
            F.round(F.percentile("p_retailprice", F.lit(0.75)), 4).alias("q3"),
            F.count("*").alias("cnt"),
        )
    )


# ---------------------------------------------------------------------------
# A8 + P12: fixed-width binning with an upper clip.
# Reference: mileage_avg.clip(upper=200000) + pd.cut 20k bins
# (price_analysis.py:139-148). Left-closed bins (documented divergence).
# ---------------------------------------------------------------------------
@register(
    "price_bins",
    oracle=f"""
    SELECT CAST(FLOOR(LEAST(o_totalprice, 200000.0) / 20000.0) AS BIGINT) AS bin_id,
           COUNT(*) AS cnt,
           {oracle_davg('o_totalprice')} AS avg_price
    FROM orders
    GROUP BY 1
    """,
    doc="Clip + fixed-width histogram bins + per-bin stats.",
)
def price_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.withColumn("bin_id", fixed_width_bin("o_totalprice", 20_000.0, clip=200_000.0))
        .groupBy("bin_id")
        .agg(
            F.count("*").alias("cnt"),
            davg("o_totalprice").alias("avg_price"),
        )
    )


# ---------------------------------------------------------------------------
# D3: deterministic keep-one-per-key (the reference's DISTINCT ON was
# nondeterministic — dags/dag.py:257; we tie-break explicitly).
# Scale (round 9): survivor selection is min(struct(order cols)) per
# key — a PARTIAL-AGGREGATING plan (operators/dedup.exact_dedup
# method="agg"): map-side combine collapses each task to one candidate
# per key before the shuffle and nothing is sorted, vs the naive
# row_number window that shuffles and sorts every input row. Measured
# at the x100 bench point: 72 s -> 4.7 s (and DuckDB's QUALIFY
# formulation takes 36 s — the aggregate rewrite is the difference
# between losing and winning this query). The oracle keeps the
# row_number spelling: identical semantics because (l_linenumber,
# l_partkey, l_suppkey) is a total order within each order.
# ---------------------------------------------------------------------------
@register(
    "keep_one_per_order",
    oracle="""
    SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber
    FROM lineitem
    QUALIFY row_number() OVER (
        PARTITION BY l_orderkey
        ORDER BY l_linenumber ASC, l_partkey ASC, l_suppkey ASC
    ) = 1
    """,
    doc="Deterministic DISTINCT ON: first lineitem per order.",
)
def keep_one_per_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The synthetic data has duplicate (orderkey, linenumber, partkey)
    # triples — the survivor order must be total, so suppkey joins the
    # tie-break. exact_dedup's default "agg" method turns this into
    # min(struct(...)) with map-side partials (see block comment).
    from etl_mudah_spark.operators.dedup import exact_dedup

    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
    )
    return exact_dedup(
        li, ["l_orderkey"], ["l_linenumber", "l_partkey", "l_suppkey"]
    ).select("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")


# ---------------------------------------------------------------------------
# J2 + A5: dimension joins + per-region rollup of fact revenue
# (TPC-H Q5 shape). nation/region are broadcast at ANY sf (they grow
# ~log(sf)); customer⋈orders is the real shuffle — co-partitioned on
# custkey, AQE handles skew.
# ---------------------------------------------------------------------------
@register(
    "region_revenue",
    oracle=f"""
    SELECT r_name,
           COUNT(*) AS order_cnt,
           {oracle_dsum('o_totalprice')} AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
    doc="Fact-to-dim star join, revenue per region (broadcast dims).",
)
def region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("order_cnt"), dsum("o_totalprice").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# A13 + D6 + joins: top-k customers by revenue (agg → join → top-k).
# ---------------------------------------------------------------------------
@register(
    "top_customers",
    oracle=f"""
    SELECT c_custkey, c_name,
           {oracle_dsum('o_totalprice')} AS revenue,
           COUNT(*) AS order_cnt
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_custkey, c_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 10
    """,
    doc="Top-10 customers by total order value.",
)
def top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(dsum("o_totalprice").alias("revenue"), F.count("*").alias("order_cnt"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# A5: multi-aggregate group stats incl. sample stddev.
# Reference: regional stats (regional_analysis.py:48-54) — pandas std is
# ddof=1 == Spark stddev == DuckDB stddev.
# ---------------------------------------------------------------------------
@register(
    "nation_customer_stats",
    oracle=f"""
    SELECT n_name,
           COUNT(*) AS cnt,
           {oracle_davg('c_acctbal')} AS avg_bal,
           ROUND(MEDIAN(c_acctbal), 4) AS median_bal,
           ROUND(STDDEV(c_acctbal), 4) AS std_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    doc="Per-nation count/avg/median/sample-stddev of balances.",
)
def nation_customer_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("cnt"),
            davg("c_acctbal").alias("avg_bal"),
            F.round(F.median("c_acctbal"), 4).alias("median_bal"),
            F.round(F.stddev("c_acctbal"), 4).alias("std_bal"),
        )
    )


# ---------------------------------------------------------------------------
# F11: share-of-rows-satisfying-predicate (global scalar vs subquery).
# Reference: (age <= avg_age).mean()*100 at price_analysis.py:115-117.
# The avg threshold is computed with the exact decimal recipe on both
# sides so the predicate boundary is identical.
# ---------------------------------------------------------------------------
@register(
    "share_above_avg",
    oracle=f"""
    SELECT 100.0 * AVG(CASE WHEN o_totalprice >
                 (SELECT {oracle_davg('o_totalprice')} FROM orders)
                 THEN 1.0 ELSE 0.0 END) AS above_avg_pct,
           COUNT(*) AS cnt
    FROM orders
    """,
    doc="Percent of orders above the global average value.",
)
def share_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The scalar average joins in as a 1-row broadcast (matching the
    # oracle's scalar subquery) instead of an eager .first() job.
    orders = load(spark, sf_dir, "orders")
    thresh = orders.agg(davg("o_totalprice").alias("_avg"))
    return (
        orders.join(F.broadcast(thresh))
        .agg(
            (
                100.0
                * F.avg(F.when(F.col("o_totalprice") > F.col("_avg"), 1.0).otherwise(0.0))
            ).alias("above_avg_pct"),
            F.count("*").alias("cnt"),
        )
    )


# ---------------------------------------------------------------------------
# P10 + D6: similarity lookup — equality + ±window ranges + limit.
# Reference: similar-listings (price_prediction.py:165-185).
# ---------------------------------------------------------------------------
@register(
    "similar_parts",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_size, p_retailprice AS retail
    FROM part
    WHERE p_brand = 'Brand#13' AND p_size BETWEEN 10 AND 20
    ORDER BY p_retailprice ASC, p_partkey ASC
    LIMIT 5
    """,
    doc="Equality + range-window similarity filter, deterministic limit.",
)
def similar_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "part")
        .where((F.col("p_brand") == "Brand#13") & F.col("p_size").between(10, 20))
        .orderBy(F.asc("p_retailprice"), F.asc("p_partkey"))
        .limit(5)
        .select(
            "p_partkey",
            "p_name",
            "p_brand",
            "p_size",
            F.col("p_retailprice").alias("retail"),
        )
    )


# ---------------------------------------------------------------------------
# F5/F6 + A2: string normalization + frequency shares.
# Reference: fuel_type.str.lower() + capitalize (market_overview.py:125-137).
# ---------------------------------------------------------------------------
@register(
    "priority_shares",
    oracle="""
    SELECT upper(substr(lower(o_orderpriority), 1, 1))
             || substr(lower(o_orderpriority), 2) AS priority,
           COUNT(*) AS cnt,
           (100.0 * COUNT(*)) / (SELECT COUNT(*) FROM orders) AS share_pct
    FROM orders
    GROUP BY 1
    """,
    doc="Lowercase + capitalize normalization with frequency shares.",
)
def priority_shares(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Global total via 1-row broadcast crossJoin — single job.
    orders = load(spark, sf_dir, "orders")
    total = orders.agg(F.count("*").alias("_total"))
    return (
        orders.select(capitalize(F.lower(F.col("o_orderpriority"))).alias("priority"))
        .groupBy("priority")
        .agg(F.count("*").alias("cnt"))
        .join(F.broadcast(total))
        .withColumn("share_pct", (100.0 * F.col("cnt")) / F.col("_total"))
        .drop("_total")
    )


# ---------------------------------------------------------------------------
# Window analytics: running revenue per customer. The running sum is in
# exact decimal (order-independent across engines), cast back to double.
# ---------------------------------------------------------------------------
@register(
    "running_customer_revenue",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate ASC, o_orderkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS running_revenue
    FROM orders
    """,
    doc="Per-customer running total with deterministic ordering.",
)
def running_customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
        .over(w)
        .cast("double")
        .alias("running_revenue"),
    )


# ---------------------------------------------------------------------------
# Top-N per group (rank window + filter).
# ---------------------------------------------------------------------------
@register(
    "top3_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice AS total
    FROM orders
    QUALIFY row_number() OVER (
        PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC
    ) <= 3
    """,
    doc="Top-3 orders per customer via ranking window.",
)
def top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        load(spark, sf_dir, "orders")
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= 3)
        .select("o_custkey", "o_orderkey", F.col("o_totalprice").alias("total"))
    )


# ---------------------------------------------------------------------------
# Pivot (cross-tab): order counts by year × status.
# Reference analog: transmission/fuel cross-frequency views.
# ---------------------------------------------------------------------------
@register(
    "orders_pivot_status",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS status_o,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS status_f,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS status_p
    FROM orders
    GROUP BY 1
    """,
    doc="Pivot order status into columns per year.",
)
def orders_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    piv = (
        load(spark, sf_dir, "orders")
        .groupBy(F.year("o_orderdate").cast("int").alias("order_year"))
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
    )
    return piv.select(
        "order_year",
        F.coalesce(F.col("O"), F.lit(0)).cast("bigint").alias("status_o"),
        F.coalesce(F.col("F"), F.lit(0)).cast("bigint").alias("status_f"),
        F.coalesce(F.col("P"), F.lit(0)).cast("bigint").alias("status_p"),
    )


# ---------------------------------------------------------------------------
# Rollup (hierarchical subtotals) region → nation.
# ---------------------------------------------------------------------------
@register(
    "rollup_region_nation",
    oracle=f"""
    SELECT COALESCE(r_name, 'ALL') AS region_name,
           COALESCE(n_name, 'ALL') AS nation_name,
           COUNT(*) AS cnt,
           {oracle_davg('c_acctbal')} AS avg_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP(r_name, n_name)
    """,
    doc="ROLLUP subtotals over the region→nation hierarchy.",
)
def rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(F.count("*").alias("cnt"), davg("c_acctbal").alias("avg_bal"))
        .select(
            F.coalesce(F.col("r_name"), F.lit("ALL")).alias("region_name"),
            F.coalesce(F.col("n_name"), F.lit("ALL")).alias("nation_name"),
            "cnt",
            "avg_bal",
        )
    )


# ---------------------------------------------------------------------------
# Anti-join: customers that never ordered (NOT EXISTS shape).
# ---------------------------------------------------------------------------
@register(
    "customers_without_orders",
    oracle="""
    SELECT COUNT(*) AS cnt
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    doc="Left-anti join: customers that never ordered.",
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .agg(F.count("*").alias("cnt"))
    )


# ---------------------------------------------------------------------------
# Date bucketing: monthly order volume (date_trunc).
# ---------------------------------------------------------------------------
@register(
    "monthly_order_volume",
    oracle=f"""
    SELECT date_trunc('month', o_orderdate) AS month_start,
           COUNT(*) AS cnt,
           {oracle_dsum('o_totalprice')} AS revenue
    FROM orders
    GROUP BY 1
    """,
    doc="Monthly tumbling buckets over order dates.",
)
def monthly_order_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("month", "o_orderdate").alias("month_start"))
        .agg(F.count("*").alias("cnt"), dsum("o_totalprice").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# P11: null-aware projection — the reference renders a listing URL only
# when present (price_prediction.py:188-190: when(isNotNull(url),
# clickable).otherwise placeholder). Here the null source is real (a
# LEFT join: customers with no orders have a null total), not a
# synthetic nullable column.
# ---------------------------------------------------------------------------
@register(
    "customer_order_links",
    oracle=f"""
    SELECT c.c_custkey,
           CASE WHEN t.total_spent IS NOT NULL
                THEN 'https://orders.example/customer/' || c.c_custkey
                ELSE 'no-orders' END AS order_link,
           ROUND(COALESCE(t.total_spent, 0), 2) AS total_spent
    FROM customer c LEFT JOIN (
        SELECT o_custkey, {oracle_dsum('o_totalprice')} AS total_spent
        FROM orders GROUP BY o_custkey
    ) t ON c.c_custkey = t.o_custkey
    """,
    doc="Null-aware URL projection over a LEFT join (missing -> placeholder).",
)
def customer_order_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    totals = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(dsum("o_totalprice").alias("total_spent"))
    )
    return (
        cust.join(totals, cust.c_custkey == totals.o_custkey, "left")
        .select(
            "c_custkey",
            F.when(
                F.col("total_spent").isNotNull(),
                F.concat(F.lit("https://orders.example/customer/"), F.col("c_custkey")),
            )
            .otherwise(F.lit("no-orders"))
            .alias("order_link"),
            F.round(F.coalesce(F.col("total_spent"), F.lit(0.0)), 2).alias("total_spent"),
        )
    )


# Hot-block exclusion bound for the fuzzy self-join: per-block pair
# work is quadratic in block size, so blocks larger than this are
# boilerplate, not entity variation, and are dropped on BOTH engines.
FUZZY_MAX_BLOCK = 10_000


@register(
    "part_name_fuzzy_pairs",
    oracle=f"""
    WITH p0 AS (
        SELECT p_partkey, p_name,
               string_split(p_name, ' ')[2] AS noun
        FROM part
    ), p AS (
        SELECT * FROM p0
        WHERE noun IN (
            SELECT noun FROM p0 GROUP BY noun
            HAVING COUNT(*) <= {FUZZY_MAX_BLOCK}
        )
    )
    SELECT a.noun,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(CASE WHEN levenshtein(a.p_name, b.p_name) = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
           CAST(SUM(CASE WHEN levenshtein(a.p_name, b.p_name) = 1
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_dist1
    FROM p a JOIN p b
      ON a.noun = b.noun AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 2
    GROUP BY a.noun ORDER BY a.noun
    """,
    doc=(
        "Blocked fuzzy self-join: near-identical part names "
        "(levenshtein<=2) per noun block, hot blocks (>10k members) "
        "excluded on both engines."
    ),
)
def part_name_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution by blocked edit distance — the fuzzy-matching
    pattern the dedup family lacks a string-metric member of: block
    candidates on a cheap equality key (here the head noun of the part
    name) so the quadratic comparison runs only INSIDE blocks, then
    filter pairs by levenshtein. At 100 TB the all-pairs form is
    unrunnable; the blocked form is one equi-join shuffle on the block
    key plus per-block pair work — the same candidates-meet-in-buckets
    discipline as the MinHash/SimHash sketches, with the string metric
    exact instead of approximate.

    Round 5 de-scale-kill: per-block pair work is quadratic in block
    size, so one hot block (a boilerplate noun shared by a million
    parts) would own the job. Blocks above FUZZY_MAX_BLOCK members are
    excluded from pairing entirely — the same explicit-exclusion
    discipline as the shingle df cap in plans/datapipe.py (a 10k block
    at levenshtein<=2 is boilerplate, not entity variation). The
    oracle applies the SAME cap, so both engines compute identical
    capped semantics; the bound is pinned by a skewed-fixture test in
    tests/test_plans.py. Both engines implement the same standard
    Levenshtein distance, so the oracle comparison is exact."""
    return _fuzzy_name_pairs(load(spark, sf_dir, "part"))


def _fuzzy_name_pairs(part: DataFrame, max_block: int = FUZZY_MAX_BLOCK) -> DataFrame:
    p0 = part.select(
        "p_partkey",
        "p_name",
        F.split("p_name", " ").getItem(1).alias("noun"),
    )
    small = (
        p0.groupBy("noun")
        .agg(F.count("*").alias("_sz"))
        .where(F.col("_sz") <= max_block)
        .select("noun")
    )
    p = p0.join(small, "noun")
    a = p.alias("a")
    b = p.alias("b")
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return (
        a.join(
            b,
            (F.col("a.noun") == F.col("b.noun"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey")),
        )
        .where(dist <= 2)
        .groupBy(F.col("a.noun").alias("noun"))
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum(F.when(dist == 0, 1).otherwise(0)).cast("bigint").alias("n_exact"),
            F.sum(F.when(dist == 1, 1).otherwise(0)).cast("bigint").alias("n_dist1"),
        )
        .orderBy("noun")
    )


@register(
    "customer_balance_deciles",
    oracle="""
    WITH d AS (
        SELECT c_acctbal,
               NTILE(10) OVER (ORDER BY c_acctbal ASC, c_custkey ASC) AS decile
        FROM customer
    )
    SELECT decile,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(MIN(c_acctbal) AS DOUBLE) AS lo,
           CAST(MAX(c_acctbal) AS DOUBLE) AS hi
    FROM d GROUP BY decile ORDER BY decile
    """,
    doc="NTILE(10) balance deciles with per-decile bounds.",
)
def customer_balance_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-population bucketing via NTILE semantics — the rank-based
    sibling of the fixed-width bins (A8): every decile holds n/10 +-1
    customers regardless of the value distribution.

    Round 5 de-scale-kill: NTILE over a global ORDER BY serializes the
    table through ONE task, so the global rank comes from
    operators/sampling.py:bucketed_global_rank instead —
    floor(c_acctbal) is an order-preserving bucket (~11k degrees for
    the TPC-H balance domain), per-bucket counts cumsum into offsets,
    and the only full-data window is hash-partitioned by bucket. The
    NTILE tile assignment is then pure arithmetic on (rank, n): with
    n = 10q + r, the first r tiles hold q+1 rows. Deterministic
    tie-break on c_custkey keeps both engines' tile boundaries
    identical; min/max per decile are input data, not accumulated
    floats — the comparison is exact."""
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    ranked = smp.bucketed_global_rank(
        cust, F.floor("c_acctbal"), ["c_acctbal", "c_custkey"], rn_col="rn"
    )
    total = cust.agg(F.count("*").alias("n"))
    return (
        ranked.crossJoin(F.broadcast(total))
        .withColumn("q", F.expr("n DIV 10"))
        .withColumn("r", F.expr("n % 10"))
        .withColumn(
            "decile",
            F.expr(
                "CAST(CASE WHEN rn <= r * (q + 1)"
                "     THEN (rn - 1) DIV (q + 1) + 1"
                "     ELSE r + (rn - r * (q + 1) - 1) DIV q + 1 END AS INT)"
            ),
        )
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_customers"),
            F.min("c_acctbal").cast("double").alias("lo"),
            F.max("c_acctbal").cast("double").alias("hi"),
        )
        .orderBy("decile")
    )


@register(
    "customer_balance_neighbors",
    oracle="""
    WITH r AS (
        SELECT c_custkey, c_acctbal,
               ROW_NUMBER() OVER (ORDER BY c_acctbal, c_custkey) AS rn
        FROM customer
    )
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           CAST(b.rn - a.rn AS INT) AS rank_dist,
           a.c_acctbal AS bal_a, b.c_acctbal AS bal_b
    FROM r a JOIN r b ON b.rn > a.rn AND b.rn - a.rn <= 3
    WHERE ABS(b.c_acctbal - a.c_acctbal) <= 0.01
    ORDER BY id_a, id_b
    """,
    doc=(
        "Sorted-neighborhood blocking (window 4 on the balance order) "
        "filtered to near-identical balances — the ordered-attribute "
        "record-linkage candidate pass; oracle is the single-task "
        "ROW_NUMBER self-join."
    ),
)
def customer_balance_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-account candidates by near-identical balance
    (operators/dedup.py sorted_neighborhood_pairs): the classic
    Hernández–Stolfo blocking pass — linear candidate volume
    ((window−1)·n) under a global (c_acctbal, c_custkey) order that is
    computed WITHOUT a single-task window (bucketed_global_rank,
    bucket = floor(acctbal): two parallel exchanges + a cumsum over
    the ~11k bucket-count rows). The oracle's one-task ROW_NUMBER is
    the semantic spec the banding must reproduce pair-for-pair; the
    |Δbal| ≤ 0.01 verification filter is the scorer stage every
    blocking pass feeds."""
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    pairs = dd.sorted_neighborhood_pairs(
        cust,
        id_col="c_custkey",
        sort_col="c_acctbal",
        bucket=F.floor(F.col("c_acctbal")),
        window=4,
    )
    return (
        pairs.where(F.abs(F.col("val_b") - F.col("val_a")) <= 0.01)
        .select(
            "id_a",
            "id_b",
            "rank_dist",
            F.col("val_a").alias("bal_a"),
            F.col("val_b").alias("bal_b"),
        )
        .orderBy("id_a", "id_b")
    )


@register(
    "part_price_size_frontier",
    oracle="""
    WITH pts AS (
        SELECT p_retailprice AS x, p_size AS y FROM part
    )
    SELECT x AS p_retailprice, CAST(y AS INT) AS p_size,
           COUNT(*) AS n_rows
    FROM pts p
    WHERE NOT EXISTS (
        SELECT 1 FROM pts q
        WHERE (q.x < p.x AND q.y >= p.y)
           OR (q.x <= p.x AND q.y > p.y)
    )
    GROUP BY x, y
    ORDER BY x
    """,
    doc=(
        "2-D Pareto frontier (min price, max size) via the bucketed "
        "sweep — the oracle is the quadratic NOT-EXISTS dominance "
        "self-join the sweep replaces."
    ),
)
def part_price_size_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline query (operators/skyline.py pareto_frontier_2d): the
    parts where no other part is both cheaper and at least as large —
    best-price-for-size. The oracle runs the textbook O(n²) dominance
    join as the semantic spec; the engine computes the identical set
    with one groupBy(x) + a two-phase bucketed strict-prefix max
    (bucket = floor(price), so the only ordered window runs over the
    ~1.2k bucket-maxima rows and the per-bucket windows run in
    parallel) — no theta-join anywhere in the plan."""
    from etl_mudah_spark.operators.skyline import pareto_frontier_2d

    part = load(spark, sf_dir, "part").select("p_retailprice", "p_size")
    return pareto_frontier_2d(
        part,
        x_col="p_retailprice",
        y_col="p_size",
        bucket=lambda c: F.floor(c),
    ).orderBy("p_retailprice")


# Fixed shard topology for the rendezvous-routing query: the (name,
# seed) list is the persisted cluster artifact; seeds are arbitrary
# fixed constants < 2^31.
SHARD_TOPOLOGY = [
    ("shard-a", 0x1111_1111),
    ("shard-b", 0x2222_2222),
    ("shard-c", 0x3333_3333),
    ("shard-d", 0x4444_4444),
]


@register(
    "customer_shard_routing",
    oracle=f"""
    WITH shards(name, sd) AS (VALUES
        {", ".join(f"('{n}', {s})" for n, s in [("shard-a", 0x11111111), ("shard-b", 0x22222222), ("shard-c", 0x33333333), ("shard-d", 0x44444444)])}
    ), x0 AS (
        SELECT c_custkey, name, xor(c_custkey, sd) % 2147483648 AS x
        FROM customer CROSS JOIN shards
    ), m1 AS (
        SELECT c_custkey, name, (xor(x >> 16, x) * 73244475) % 2147483648 AS x
        FROM x0
    ), m2 AS (
        SELECT c_custkey, name, (xor(x >> 16, x) * 73244475) % 2147483648 AS x
        FROM m1
    ), h AS (
        SELECT c_custkey, name, xor(x >> 16, x) AS w FROM m2
    ), win AS (
        SELECT c_custkey, name,
               ROW_NUMBER() OVER (
                   PARTITION BY c_custkey ORDER BY w DESC, name DESC
               ) AS rn
        FROM h
    )
    SELECT name AS shard, COUNT(*) AS n_keys,
           CAST(MIN(c_custkey) AS BIGINT) AS min_key,
           CAST(MAX(c_custkey) AS BIGINT) AS max_key,
           CAST(SUM(c_custkey) AS BIGINT) AS sum_key
    FROM win WHERE rn = 1
    GROUP BY name
    ORDER BY name
    """,
    doc=(
        "Rendezvous (HRW) shard routing of customers over a 4-shard "
        "topology: per-shard membership fingerprints; the oracle "
        "re-runs the weight argmax through the shared mixer."
    ),
)
def customer_shard_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic shard routing (operators/sampling.py
    rendezvous_assign): highest-random-weight hashing gives minimal
    movement under topology change — remove a shard and ONLY its keys
    move (pinned in tests) — with no ring state, just the (name, seed)
    list. The engine side is map-only struct-argmax (no explode, no
    window, no shuffle before the summary agg); the oracle replays
    the same mixer per (key, shard) and takes the window argmax.
    Membership is pinned by min/max/sum fingerprints per shard, not
    just counts."""
    from etl_mudah_spark.operators.sampling import rendezvous_assign

    cust = load(spark, sf_dir, "customer").select("c_custkey")
    routed = rendezvous_assign(cust, "c_custkey", SHARD_TOPOLOGY)
    return (
        routed.groupBy(F.col("shard"))
        .agg(
            F.count("*").alias("n_keys"),
            F.min("c_custkey").cast("bigint").alias("min_key"),
            F.max("c_custkey").cast("bigint").alias("max_key"),
            F.sum("c_custkey").cast("bigint").alias("sum_key"),
        )
        .orderBy("shard")
    )


# m-probability literals for the Fellegi-Sunter part-linkage demo:
# P(field agrees | same entity). Absent labeled pairs these are the
# standard conservative literals; u comes from the data (operators/er).
ER_M_BRAND = 0.95
ER_M_TYPE = 0.9
ER_M_SIZE = 0.85


@register(
    "part_er_match_scores",
    oracle=f"""
    WITH p0 AS (
        SELECT p_partkey, p_brand, p_type, p_size,
               string_split(p_name, ' ')[2] AS noun
        FROM part
    ), keyed AS (
        SELECT * FROM p0
        WHERE noun IN (
            SELECT noun FROM p0 GROUP BY noun
            HAVING COUNT(*) <= {FUZZY_MAX_BLOCK}
        )
    ), ub AS (
        SELECT LEAST(GREATEST(COALESCE(
                   SUM(f * (f - 1)) * 1.0 / (SUM(f) * (SUM(f) - 1)),
               1e-9), 1e-9), 1 - 1e-9) AS u
        FROM (SELECT COUNT(*) AS f FROM part GROUP BY p_brand)
    ), ut AS (
        SELECT LEAST(GREATEST(COALESCE(
                   SUM(f * (f - 1)) * 1.0 / (SUM(f) * (SUM(f) - 1)),
               1e-9), 1e-9), 1 - 1e-9) AS u
        FROM (SELECT COUNT(*) AS f FROM part GROUP BY p_type)
    ), uc AS (
        SELECT LEAST(GREATEST(COALESCE(
                   SUM(f * (f - 1)) * 1.0 / (SUM(f) * (SUM(f) - 1)),
               1e-9), 1e-9), 1 - 1e-9) AS u
        FROM (SELECT COUNT(*) AS f FROM part GROUP BY p_size)
    ), scored AS (
        SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
               a.p_brand = b.p_brand AS agree_p_brand,
               a.p_type = b.p_type AS agree_p_type,
               a.p_size = b.p_size AS agree_p_size,
               (CASE WHEN a.p_brand = b.p_brand
                     THEN ln({ER_M_BRAND} / ub.u)
                     ELSE ln((1.0 - {ER_M_BRAND}) / (1.0 - ub.u)) END
                + CASE WHEN a.p_type = b.p_type
                       THEN ln({ER_M_TYPE} / ut.u)
                       ELSE ln((1.0 - {ER_M_TYPE}) / (1.0 - ut.u)) END
                + CASE WHEN a.p_size = b.p_size
                       THEN ln({ER_M_SIZE} / uc.u)
                       ELSE ln((1.0 - {ER_M_SIZE}) / (1.0 - uc.u)) END
               ) AS score
        FROM keyed a
        JOIN keyed b ON a.noun = b.noun AND a.p_partkey < b.p_partkey
        CROSS JOIN ub CROSS JOIN ut CROSS JOIN uc
    )
    SELECT id_a, id_b, agree_p_brand, agree_p_type, agree_p_size,
           ROUND(score, 4) AS score
    FROM scored
    ORDER BY ROUND(score, 4) DESC, id_a, id_b
    LIMIT 25
    """,
    doc=(
        "Fellegi-Sunter record-linkage scores over noun-blocked part "
        "pairs: per-field log likelihood ratios with data-estimated "
        "u-probabilities, top-25 candidate matches."
    ),
)
def part_er_match_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probabilistic entity resolution (operators/er.fs_score_pairs):
    score every noun-blocked part pair by summed per-field log
    likelihood ratios — agreeing on a 25-value brand carries less
    evidence than agreeing on a 150-value type or a 50-value size, and the weights know
    it because u = Σf(f−1)/(N(N−1)) is estimated from the actual
    value frequencies (three map-side-combined 1-row aggregates,
    broadcast into the scorer — no collect). Blocking + the
    FUZZY_MAX_BLOCK hot-block cap keep pair work Σ|block|²; scoring
    is per-row codegen arithmetic. Scores round to 4 for the ordered
    top-25 (ln determinism per the MI/keyness precedent)."""
    from etl_mudah_spark.operators.er import fs_score_pairs

    part = load(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_brand", "p_type", "p_size"
    )
    scored = fs_score_pairs(
        part,
        id_col="p_partkey",
        block_col=F.split("p_name", " ").getItem(1),
        fields={
            "p_brand": ER_M_BRAND,
            "p_type": ER_M_TYPE,
            "p_size": ER_M_SIZE,
        },
        max_block=FUZZY_MAX_BLOCK,
    )
    return (
        scored.select(
            "id_a",
            "id_b",
            "agree_p_brand",
            "agree_p_type",
            "agree_p_size",
            F.round("score", 4).alias("score"),
        )
        .orderBy(F.desc("score"), "id_a", "id_b")
        .limit(25)
    )


@register(
    "customer_revenue_gini",
    oracle="""
    WITH rev AS (
        SELECT o_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS x
        FROM orders GROUP BY o_custkey
    ), ranked AS (
        SELECT x, ROW_NUMBER() OVER (ORDER BY x, o_custkey) AS i FROM rev
    ), s AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(i * x AS DECIMAL(38,6))) AS DOUBLE) AS six
        FROM ranked
    )
    SELECT CAST(n AS BIGINT) AS n_customers,
           sx AS total_revenue,
           (2.0 * six) / (n * sx) - (n + 1.0) / n AS gini
    FROM s
    """,
    doc=(
        "Gini coefficient of per-customer order revenue via the "
        "rank-weighted sum identity — inequality/concentration in one "
        "exact scalar."
    ),
)
def customer_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration as a Gini coefficient: G =
    (2·Σ iᐧxᵢ)/(n·Σx) − (n+1)/n with xᵢ ascending and i the global
    rank. The rank comes from operators/sampling.bucketed_global_rank
    (floor(x) buckets — order-preserving, non-null): per-bucket
    counts, a cumsum over the bucket-count relation, and a parallel
    per-bucket ranking window — the whole customer vector is never
    sorted in one task. Revenue sums and the rank-weighted products
    ride the decimal lattice, so the scalar is partition-order-exact
    in both engines."""
    from etl_mudah_spark.operators.sampling import bucketed_global_rank

    rev = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            .cast("double")
            .alias("x")
        )
    )
    # Bucket = floor(x/10k): per-customer revenue MAGNITUDE is scale-
    # stable (orders per customer stay ~constant as the corpus grows),
    # so the bucket domain is a few hundred values at any sf — the
    # phase-2 cumsum task sees O(domain) rows, never O(customers).
    # (floor(x) would be ~one bucket per customer: an unbounded
    # single-task relation at scale.)
    ranked = bucketed_global_rank(
        rev,
        F.floor(F.col("x") / 10_000).cast("bigint"),
        ["x", "o_custkey"],
        rn_col="i",
    )
    s = ranked.agg(
        F.count("*").alias("n"),
        F.sum(F.col("x").cast("decimal(18,6)")).cast("double").alias("sx"),
        F.sum((F.col("i") * F.col("x")).cast("decimal(38,6)"))
        .cast("double")
        .alias("six"),
    )
    return s.select(
        F.col("n").cast("bigint").alias("n_customers"),
        F.col("sx").alias("total_revenue"),
        ((2.0 * F.col("six")) / (F.col("n") * F.col("sx"))
         - (F.col("n") + 1.0) / F.col("n")).alias("gini"),
    )


# Fellegi-Sunter decision threshold for the linkage demo: above this
# summed log-likelihood ratio a pair is declared a match (at the data's
# u-probabilities only all-three-field agreements clear it).
ER_MATCH_THRESHOLD = 8.0


@register(
    "part_golden_records",
    oracle=f"""
    WITH RECURSIVE p0 AS (
        SELECT p_partkey, p_brand, p_type, p_size,
               string_split(p_name, ' ')[2] AS noun
        FROM part
    ), keyed AS (
        SELECT * FROM p0
        WHERE noun IN (
            SELECT noun FROM p0 GROUP BY noun
            HAVING COUNT(*) <= {FUZZY_MAX_BLOCK}
        )
    ), ub AS (
        SELECT LEAST(GREATEST(COALESCE(
                   SUM(f * (f - 1)) * 1.0 / (SUM(f) * (SUM(f) - 1)),
               1e-9), 1e-9), 1 - 1e-9) AS u
        FROM (SELECT COUNT(*) AS f FROM part GROUP BY p_brand)
    ), ut AS (
        SELECT LEAST(GREATEST(COALESCE(
                   SUM(f * (f - 1)) * 1.0 / (SUM(f) * (SUM(f) - 1)),
               1e-9), 1e-9), 1 - 1e-9) AS u
        FROM (SELECT COUNT(*) AS f FROM part GROUP BY p_type)
    ), uc AS (
        SELECT LEAST(GREATEST(COALESCE(
                   SUM(f * (f - 1)) * 1.0 / (SUM(f) * (SUM(f) - 1)),
               1e-9), 1e-9), 1 - 1e-9) AS u
        FROM (SELECT COUNT(*) AS f FROM part GROUP BY p_size)
    ), pairs AS (
        SELECT a.p_partkey AS s, b.p_partkey AS d
        FROM keyed a
        JOIN keyed b ON a.noun = b.noun AND a.p_partkey < b.p_partkey
        CROSS JOIN ub CROSS JOIN ut CROSS JOIN uc
        WHERE (CASE WHEN a.p_brand = b.p_brand
                    THEN ln({ER_M_BRAND} / ub.u)
                    ELSE ln((1.0 - {ER_M_BRAND}) / (1.0 - ub.u)) END
               + CASE WHEN a.p_type = b.p_type
                      THEN ln({ER_M_TYPE} / ut.u)
                      ELSE ln((1.0 - {ER_M_TYPE}) / (1.0 - ut.u)) END
               + CASE WHEN a.p_size = b.p_size
                      THEN ln({ER_M_SIZE} / uc.u)
                      ELSE ln((1.0 - {ER_M_SIZE}) / (1.0 - uc.u)) END
              ) >= {ER_MATCH_THRESHOLD}
    ), edges AS (
        SELECT s, d FROM pairs UNION SELECT d, s FROM pairs
    ), nodes AS (
        SELECT DISTINCT s AS node FROM edges
    ), reach(node, r) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT e.d, reach.r FROM reach JOIN edges e ON e.s = reach.node
    ), comp AS (
        SELECT node, MIN(r) AS cluster_id FROM reach GROUP BY node
    ), mem AS (
        SELECT comp.cluster_id, p.p_brand, p.p_type, p.p_size
        FROM comp JOIN part p ON p.p_partkey = comp.node
    ), base AS (
        SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_members
        FROM mem GROUP BY 1
    ), cb AS (
        SELECT cluster_id, p_brand AS v, COUNT(*) AS cnt
        FROM mem GROUP BY 1, 2
    ), mb AS (
        SELECT cluster_id, MAX(cnt) AS mx,
               CAST(COUNT(*) AS BIGINT) AS nd FROM cb GROUP BY 1
    ), gb AS (
        SELECT cb.cluster_id, MIN(v) AS golden_p_brand,
               MAX(mb.nd) AS n_distinct_p_brand
        FROM cb JOIN mb USING (cluster_id) WHERE cb.cnt = mb.mx GROUP BY 1
    ), ct AS (
        SELECT cluster_id, p_type AS v, COUNT(*) AS cnt
        FROM mem GROUP BY 1, 2
    ), mt AS (
        SELECT cluster_id, MAX(cnt) AS mx,
               CAST(COUNT(*) AS BIGINT) AS nd FROM ct GROUP BY 1
    ), gt AS (
        SELECT ct.cluster_id, MIN(v) AS golden_p_type,
               MAX(mt.nd) AS n_distinct_p_type
        FROM ct JOIN mt USING (cluster_id) WHERE ct.cnt = mt.mx GROUP BY 1
    ), cs AS (
        SELECT cluster_id, p_size AS v, COUNT(*) AS cnt
        FROM mem GROUP BY 1, 2
    ), ms AS (
        SELECT cluster_id, MAX(cnt) AS mx,
               CAST(COUNT(*) AS BIGINT) AS nd FROM cs GROUP BY 1
    ), gs AS (
        SELECT cs.cluster_id, MIN(v) AS golden_p_size,
               MAX(ms.nd) AS n_distinct_p_size
        FROM cs JOIN ms USING (cluster_id) WHERE cs.cnt = ms.mx GROUP BY 1
    )
    SELECT base.cluster_id, base.n_members,
           gb.golden_p_brand, gb.n_distinct_p_brand,
           gt.golden_p_type, gt.n_distinct_p_type,
           gs.golden_p_size, gs.n_distinct_p_size
    FROM base
    JOIN gb USING (cluster_id) JOIN gt USING (cluster_id)
    JOIN gs USING (cluster_id)
    ORDER BY cluster_id
    """,
    doc=(
        "ER pipeline closure: Fellegi-Sunter matches above the "
        "decision threshold -> connected components -> one golden "
        "record per entity cluster (modal value per field, "
        "deterministic tie-break, conflict counts)."
    ),
)
def part_golden_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The step the reference's upsert hints at but never does
    (dags/dag.py:250-266 refreshes by exact listing_id only): block ->
    score (operators/er.fs_score_pairs) -> threshold -> transitive
    closure (operators/graph.duplicate_clusters, the large/small-star
    CC) -> survivorship (operators/er.golden_records: per-field MODE
    with max-count-then-min-value tie-break — never first()). The
    n_distinct_* columns are the conflict provenance a steward reads
    before trusting the merge. Everything is exact: the score
    threshold compares engine-identical doubles (fixed-shape ln
    sums), clusters are min-id canonical, modes are count arithmetic.
    Scale: blocked Σ|block|² pair work with the hot-block cap, O(log n)
    CC rounds, and per-field (cluster, value) aggregations — no
    per-cluster arrays, so a giant cluster stays distributed."""
    from etl_mudah_spark.operators.er import fs_score_pairs, golden_records
    from etl_mudah_spark.operators import graph as gr

    part = load(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_brand", "p_type", "p_size"
    )
    scored = fs_score_pairs(
        part,
        id_col="p_partkey",
        block_col=F.split("p_name", " ").getItem(1),
        fields={
            "p_brand": ER_M_BRAND,
            "p_type": ER_M_TYPE,
            "p_size": ER_M_SIZE,
        },
        max_block=FUZZY_MAX_BLOCK,
    )
    matched = scored.where(F.col("score") >= ER_MATCH_THRESHOLD).select(
        "id_a", "id_b"
    )
    clusters = gr.duplicate_clusters(matched, src="id_a", dst="id_b")
    members = clusters.select(
        F.col("node").alias("p_partkey"), "cluster_id"
    ).join(part, "p_partkey")
    golden = golden_records(
        members, "cluster_id", ["p_brand", "p_type", "p_size"]
    )
    return golden.select(
        "cluster_id",
        "n_members",
        "golden_p_brand",
        "n_distinct_p_brand",
        "golden_p_type",
        "n_distinct_p_type",
        "golden_p_size",
        "n_distinct_p_size",
    ).orderBy("cluster_id")


@register(
    "customer_k_anonymity",
    oracle="""
    WITH cls AS (
        SELECT c_nationkey, c_mktsegment,
               COUNT(*) AS sz,
               COUNT(DISTINCT COALESCE(
                   CAST(CAST(floor(c_acctbal / 1000) AS BIGINT) AS VARCHAR),
                   '<null>')) AS l
        FROM customer GROUP BY 1, 2
    )
    SELECT 5 AS k,
           CAST(SUM(sz) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(MIN(sz) AS BIGINT) AS min_class_size,
           CAST(SUM(CASE WHEN sz < 5 THEN 1 ELSE 0 END) AS BIGINT)
               AS classes_below_k,
           CAST(SUM(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT)
               AS rows_below_k,
           SUM(CASE WHEN sz < 5 THEN sz ELSE 0 END) * 100.0 / SUM(sz)
               AS pct_below_k,
           CAST(MIN(l) AS BIGINT) AS min_l_diversity
    FROM cls
    """,
    doc=(
        "k-anonymity / l-diversity audit of customer under the "
        "(nation, market segment) quasi-identifier: class-size floor, "
        "rows needing suppression at k=5, and the sensitive-attribute "
        "diversity floor."
    ),
)
def customer_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The release gate the PII family was missing
    (operators/pii.k_anonymity_report): scrubbing text removes direct
    identifiers, but the SCHEMA can still re-identify — any
    (nation, segment) class smaller than k pins a person to <= k-1
    candidates, and a class whose account-balance band (the sensitive
    attribute, bucketed to thousands) is uniform leaks it outright
    (that is the l-diversity floor). One quasi-identifier aggregation
    with map-side partials and a 1-row reduction — integer counts,
    one percentage division; complements customer_erasure_audit
    (delete one person) with the aggregate question (publish them
    all?)."""
    from etl_mudah_spark.operators.pii import k_anonymity_report

    cust = load(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("bal_band"),
    )
    return k_anonymity_report(
        cust,
        quasi_cols=["c_nationkey", "c_mktsegment"],
        sensitive_col="bal_band",
        k=5,
    )


@register(
    "customer_revenue_lorenz",
    oracle="""
    WITH rev AS (
        SELECT o_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
                   AS x
        FROM orders GROUP BY o_custkey
    ), ranked AS (
        SELECT x, ROW_NUMBER() OVER (ORDER BY x, o_custkey) AS i
        FROM rev
    ), t AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) AS sx
        FROM ranked
    ), dec AS (
        SELECT CAST(((i - 1) * 10) // n AS INT) AS decile,
               COUNT(*) AS n_customers,
               CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        FROM ranked CROSS JOIN t GROUP BY 1
    ), cum AS (
        SELECT decile, n_customers, revenue,
               CAST(SUM(CAST(revenue AS DECIMAL(18,6)))
                    OVER (ORDER BY decile) AS DOUBLE) AS cum_revenue
        FROM dec
    )
    SELECT decile, CAST(n_customers AS BIGINT) AS n_customers, revenue,
           cum_revenue / t.sx AS cum_revenue_share
    FROM cum CROSS JOIN t ORDER BY decile
    """,
    doc=(
        "Lorenz curve of customer revenue: ascending-rank deciles "
        "with cumulative revenue share — the curve behind the Gini "
        "scalar, read directly as 'the bottom 50% hold X%'."
    ),
)
def customer_revenue_lorenz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distributional companion to customer_revenue_gini: the
    scalar says HOW concentrated, the curve says WHERE — each decile
    of customers (ascending by lifetime revenue, rank from
    operators/sampling.bucketed_global_rank with the same
    floor(x/10k) magnitude buckets, so no single task sorts the
    customer vector) with its cumulative share of total revenue.
    Decile assignment is integer arithmetic ((i−1)·10 div n); revenue
    sums and the cumulative pass ride the decimal lattice; the share
    is one division by the 1-row total broadcast. The 10-row
    cumulative window runs over the decile relation, never data."""
    from etl_mudah_spark.operators.sampling import bucketed_global_rank

    rev = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            .cast("double")
            .alias("x")
        )
    )
    ranked = bucketed_global_rank(
        rev,
        bucket=F.floor(F.col("x") / 10000).cast("bigint"),
        order_cols=["x", "o_custkey"],
        rn_col="i",
    )
    t = ranked.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("x").cast("decimal(18,6)")).cast("double").alias("sx"),
    )
    dec = (
        ranked.join(F.broadcast(t))
        .groupBy(
            F.expr("CAST(((i - 1) * 10) div n AS INT)").alias("decile")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_customers"),
            F.sum(F.col("x").cast("decimal(18,6)"))
            .cast("double")
            .alias("revenue"),
        )
    )
    wc = W.orderBy("decile").rowsBetween(W.unboundedPreceding, 0)
    cum = dec.withColumn(
        "cum_revenue",
        F.sum(F.col("revenue").cast("decimal(18,6)")).over(wc).cast("double"),
    )
    return (
        cum.join(F.broadcast(t.select("sx")))
        .select(
            "decile",
            "n_customers",
            "revenue",
            (F.col("cum_revenue") / F.col("sx")).alias("cum_revenue_share"),
        )
        .orderBy("decile")
    )
