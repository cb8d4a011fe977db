"""Temporal / analytical-join queries beyond the reference's surface:
as-of join, range (interval) join, moving-window aggregates, CUBE.

These are the operator families a time-series-flavored workload needs
that plain star-schema queries don't exercise. Each carries a DuckDB
oracle except where noted. Scale notes inline per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from etl_mudah_spark.functions.core import _DEC, dsum, oracle_dsum
from etl_mudah_spark.operators.asof import asof_join_backward
from etl_mudah_spark.operators import similarity as sim
from etl_mudah_spark.plans import datapipe as dp
from etl_mudah_spark.plans.registry import register
from etl_mudah_spark.tables import load


# ---------------------------------------------------------------------------
# As-of join: for every click, the value of the user's most recent view
# at-or-before the click. DuckDB spells this ASOF LEFT JOIN; Spark has
# no such primitive — operators/asof.py implements it as union + running
# window (one key shuffle, no pair explosion; see module docstring).
# ---------------------------------------------------------------------------
@register(
    "events_asof_last_view",
    oracle="""
    SELECT c.event_id, c.user_id, c.ts, c.value, v.value AS view_value_asof
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON c.user_id = v.user_id AND c.ts >= v.ts
    """,
    doc="As-of join: latest prior 'view' value attached to each 'click'.",
)
def events_asof_last_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    views = ev.where(F.col("event_type") == "view").select("user_id", "ts", "value")
    return asof_join_backward(
        clicks,
        views,
        key_cols=["user_id"],
        left_ts="ts",
        right_ts="ts",
        value_cols=["value"],
        suffix="_asof",
    ).withColumnRenamed("value_asof", "view_value_asof")


# ---------------------------------------------------------------------------
# Range (interval) join: events × overlapping promo windows. The windows
# OVERLAP, so this is a genuine interval join (a row can land in two
# promos), not disguised bucketing. Scale: the interval dim is tiny and
# broadcast — a map-side nested-loop against ~10 intervals per row, no
# shuffle of the fact side. (For two LARGE interval sets you'd bin both
# sides to a grid and equi-join on the bin — operators/intervals.py,
# exercised by events_session_concurrency below.)
# ---------------------------------------------------------------------------
_PROMOS = [
    (1, "2024-01-02 00:00:00", "2024-01-05 00:00:00"),
    (2, "2024-01-04 00:00:00", "2024-01-10 00:00:00"),
    (3, "2024-01-08 00:00:00", "2024-01-09 00:00:00"),
    (4, "2024-01-15 00:00:00", "2024-01-22 00:00:00"),
    (5, "2024-01-20 00:00:00", "2024-01-28 00:00:00"),
]

_PROMOS_SQL = ", ".join(
    f"({i}, TIMESTAMP '{s}', TIMESTAMP '{e}')" for i, s, e in _PROMOS
)


@register(
    "events_promo_range_join",
    oracle=f"""
    SELECT p.promo_id,
           COUNT(*) AS cnt,
           {oracle_dsum('e.value')} AS total_value
    FROM events e
    JOIN (VALUES {_PROMOS_SQL}) p(promo_id, start_ts, end_ts)
      ON e.ts >= p.start_ts AND e.ts < p.end_ts
    GROUP BY p.promo_id
    """,
    doc="Interval join of events onto overlapping promo windows.",
)
def events_promo_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    promos = spark.createDataFrame(
        [(i, s, e) for i, s, e in _PROMOS],
        "promo_id int, start_ts string, end_ts string",
    ).select(
        "promo_id",
        F.col("start_ts").cast("timestamp").alias("start_ts"),
        F.col("end_ts").cast("timestamp").alias("end_ts"),
    )
    return (
        ev.join(
            F.broadcast(promos),
            (ev.ts >= promos.start_ts) & (ev.ts < promos.end_ts),
        )
        .groupBy("promo_id")
        .agg(F.count("*").alias("cnt"), dsum("value").alias("total_value"))
    )


# ---------------------------------------------------------------------------
# Moving-window aggregate: 7-day moving average of daily order revenue.
# Window sums stay DECIMAL (exact, order-independent — functions/core.py
# policy) and only the final value casts to double; the division happens
# in double on both engines (decimal division scale rules differ).
# Scale: the window runs over the ALREADY-AGGREGATED daily series
# (~2.4k rows at any sf) — a single-partition window over an aggregate
# is deliberate, not a smell; the heavy lifting (daily groupBy) is the
# distributed part.
# ---------------------------------------------------------------------------
@register(
    "daily_revenue_moving_avg",
    oracle="""
    WITH daily AS (
        SELECT date_trunc('day', o_orderdate) AS d,
               SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS rev_dec
        FROM orders
        GROUP BY 1
    )
    SELECT d,
           CAST(rev_dec AS DOUBLE) AS daily_revenue,
           CAST(SUM(rev_dec) OVER w AS DOUBLE)
               / (COUNT(*) OVER w) AS ma7_revenue
    FROM daily
    WINDOW w AS (ORDER BY d ASC ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
    doc="7-day moving average over the daily revenue series (lag frame).",
)
def daily_revenue_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load(spark, sf_dir, "orders")
        # date_trunc (timestamp), not to_date: the comparator sees DATE
        # columns as midnight datetimes on the DuckDB side.
        .groupBy(F.date_trunc("day", "o_orderdate").alias("d"))
        .agg(F.sum(F.col("o_totalprice").cast(_DEC)).alias("rev_dec"))
    )
    w = W.orderBy(F.asc("d")).rowsBetween(-6, W.currentRow)
    return daily.select(
        "d",
        F.col("rev_dec").cast("double").alias("daily_revenue"),
        (F.sum("rev_dec").over(w).cast("double") / F.count("*").over(w)).alias(
            "ma7_revenue"
        ),
    )


# ---------------------------------------------------------------------------
# CUBE: all grouping-set combinations of (status, priority) in one pass.
# Spark expands grouping sets BEFORE the shuffle with partial aggs per
# set — one scan, one shuffle, same as a plain groupBy. (rollup is
# covered by rollup_region_nation in parity.py.)
# ---------------------------------------------------------------------------
@register(
    "orders_cube_status_priority",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS cnt,
           {oracle_dsum('o_totalprice')} AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="CUBE over (status, priority): all grouping sets in one pass.",
)
def orders_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("cnt"), dsum("o_totalprice").alias("total_price"))
    )


# ---------------------------------------------------------------------------
# IVF ANN: KMeans coarse quantizer + probe-nearest-cells exact scan —
# the scale path past brute force (see operators/similarity.py).
# Round-5 invariant shape (same as ann_srp_topk/ann_pq_topk): KMeans
# cells aren't reproducible cross-engine, so the driver rows are the
# exact cosine top-10 with a recall-floor boolean. The testdata's
# neighbors sit at cosine ~0.3 — a hard regime for a coarse quantizer
# over tiny corpora — so the floor is 5/10 (measured: 10/10 at sf0.01,
# 7/10 at sf0.001 with probe=6; tests/test_similarity_ivf.py pins the
# operator-level recall separately).
# ---------------------------------------------------------------------------
IVF_MIN_HITS_AT_10 = 5


@register(
    "ann_ivf_topk",
    oracle=dp._BRUTE_TOPK_ORACLE,
    doc=(
        "IVF ANN top-10 recall invariant (KMeans(16) cells, probe 6, "
        "exact within) vs the exact cosine top-10."
    ),
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # probe as a broadcast 1-row relation: cell selection happens
    # in-plan; the KMeans fit is the only eager step (round 6)
    emb = load(spark, sf_dir, "embeddings")
    probe = sim.probe_row(emb)
    brute = sim.brute_force_topk_df(emb, probe, k=10)
    approx = sim.ivf_topk_df(emb, probe, k=10, n_cells=16, n_probe=6)
    return dp._ann_recall_rows(brute, approx, min_hits=IVF_MIN_HITS_AT_10)


# ---------------------------------------------------------------------------
# SCD type-2 history collapse (operators/scd.py): the orders stream as a
# per-customer change log of o_orderpriority -> one row per priority
# RUN with [valid_from, valid_to) intervals. The merge surface
# (operators/merge.py) is SCD1 — overwrite in place; this is the other
# standard dimension-history shape, and it composes with the as-of join
# (events_asof_last_view) for "attribute as of time T" lookups.
# Both windows partition by customer — keyed parallelism, no global
# window. Exact oracle: same gaps-and-islands in DuckDB window SQL
# (IS NOT DISTINCT FROM mirrors eqNullSafe).
# ---------------------------------------------------------------------------
@register(
    "customer_priority_scd2",
    oracle="""
    WITH flagged AS (
        SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
               CASE WHEN o_orderpriority IS NOT DISTINCT FROM
                         LAG(o_orderpriority) OVER w
                    THEN 0 ELSE 1 END AS brk
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ), versioned AS (
        SELECT o_custkey, o_orderpriority, o_orderdate,
               CAST(SUM(brk) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS UNBOUNDED PRECEDING) AS INT) AS version
        FROM flagged
    ), runs AS (
        SELECT o_custkey, version,
               MIN(o_orderpriority) AS o_orderpriority,
               MIN(o_orderdate) AS valid_from,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM versioned GROUP BY 1, 2
    )
    SELECT o_custkey, version, o_orderpriority, valid_from,
           LEAD(valid_from) OVER (
               PARTITION BY o_custkey ORDER BY version) AS valid_to,
           n_rows
    FROM runs
    """,
    doc=(
        "SCD2 dimension history: per-customer o_orderpriority runs with "
        "[valid_from, valid_to) intervals from the orders change log."
    ),
)
def customer_priority_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_mudah_spark.operators.scd import scd2_collapse

    orders = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority", "o_orderdate", "o_orderkey"
    )
    return scd2_collapse(
        orders,
        key_cols=["o_custkey"],
        attr_cols=["o_orderpriority"],
        ts_col="o_orderdate",
        tiebreak_cols=["o_orderkey"],
    )


# ---------------------------------------------------------------------------
# CDC snapshot diff (operators/cdc.py): the change-data-feed shape.
# Two deterministic snapshots derived from orders (v2 = v1 with keymod
# deletes, repriced updates, and negative-key inserts) diffed into
# insert/delete/update rows with pre/post images. The reference
# overwrites its Postgres table in place every run (dags/dag.py:243-266)
# — this is what makes the manifest-versioned variant of that sink
# auditable. Exact oracle: the same FULL OUTER JOIN in DuckDB
# (IS DISTINCT FROM mirrors the null-safe fingerprint compare).
# ---------------------------------------------------------------------------
@register(
    "orders_version_diff",
    oracle="""
    WITH v1 AS (
        SELECT o_orderkey, o_orderpriority FROM orders
    ), v2 AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 89 = 3 THEN '9-REPRICED'
                    ELSE o_orderpriority END AS o_orderpriority
        FROM orders WHERE o_orderkey % 97 <> 0
        UNION ALL
        SELECT -o_orderkey, '1-URGENT' FROM orders WHERE o_orderkey % 101 = 5
    ), j AS (
        SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
               a.o_orderpriority AS old_o_orderpriority,
               b.o_orderpriority AS new_o_orderpriority,
               a.o_orderkey IS NOT NULL AS in_old,
               b.o_orderkey IS NOT NULL AS in_new
        FROM v1 a FULL OUTER JOIN v2 b ON a.o_orderkey = b.o_orderkey
    )
    SELECT o_orderkey,
           CASE WHEN NOT in_old THEN 'insert'
                WHEN NOT in_new THEN 'delete'
                WHEN old_o_orderpriority IS DISTINCT FROM new_o_orderpriority
                     THEN 'update' END AS change_type,
           old_o_orderpriority, new_o_orderpriority
    FROM j
    WHERE (NOT in_old) OR (NOT in_new)
       OR old_o_orderpriority IS DISTINCT FROM new_o_orderpriority
    """,
    doc=(
        "CDC snapshot diff: insert/delete/update classification with "
        "pre/post images between two orders snapshots."
    ),
)
def orders_version_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/cdc.py table_diff on a deterministic snapshot pair:
    one full-outer hash join on the key, map-side xxhash64 fingerprint
    so the wide-row compare never shuffles twice, unchanged keys (the
    overwhelming majority) dropped at the join. At 100 TB the two
    snapshots co-locate via shared bucketing (operators/layout.py) and
    the exchange disappears; here both sides derive from one scan and
    AQE reuses it."""
    from etl_mudah_spark.operators.cdc import table_diff

    v1 = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    key = F.col("o_orderkey")
    v2 = (
        v1.where(key % 97 != 0)
        .withColumn(
            "o_orderpriority",
            F.when(key % 89 == 3, F.lit("9-REPRICED")).otherwise(
                F.col("o_orderpriority")
            ),
        )
        .unionByName(
            v1.where(key % 101 == 5).select(
                (-key).alias("o_orderkey"), F.lit("1-URGENT").alias("o_orderpriority")
            )
        )
    )
    return table_diff(v1, v2, ["o_orderkey"], compare_cols=["o_orderpriority"])


# ---------------------------------------------------------------------------
# Large×large interval self-join: session concurrency. Sessionize every
# user's events with a 30-minute gap (JVM session_window — batch mode,
# no state store), then for each session count the OTHER sessions whose
# [start, end) interval overlaps it. Unlike events_promo_range_join the
# interval set is NOT broadcastable (it scales with users×time), so the
# plan uses the binned strategy from operators/intervals.py: replicate
# each session into the 30-minute grid bins it touches, equi-join on the
# bin (a plain shuffled hash join — no CartesianProduct, no BNLJ), and
# emit each pair exactly once from the bin holding the overlap's start.
# Scale: work is Σ_bins |sessions_b|² — proportional to CONCURRENCY
# density, never to |sessions|²; a hot bin (flash event) is visible in
# a per-bin count and cappable like the LSH buckets. The oracle spells
# the same sessionization with lag + running sum (DuckDB has no
# session_window) and the overlap join as an inequality join (IEJoin).
# ---------------------------------------------------------------------------
@register(
    "events_session_concurrency",
    oracle="""
    WITH marks AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts >= lag(ts) OVER w + INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sess AS (
      SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM marks
    ), iv AS (
      SELECT user_id,
             CAST(floor(epoch(MIN(ts))) AS BIGINT) AS session_start_sec,
             MIN(ts) AS s, MAX(ts) + INTERVAL 30 MINUTE AS e,
             COUNT(*) AS n_events
      FROM sess GROUP BY user_id, sid
    ), deg AS (
      SELECT l.user_id, l.session_start_sec, COUNT(*) AS n_overlap
      FROM iv l JOIN iv r
        ON l.s < r.e AND r.s < l.e
       AND (l.user_id != r.user_id OR l.s != r.s)
      GROUP BY l.user_id, l.session_start_sec
    )
    SELECT iv.user_id, iv.session_start_sec, iv.n_events,
           COALESCE(deg.n_overlap, 0) AS n_overlap
    FROM iv LEFT JOIN deg
      ON iv.user_id = deg.user_id
     AND iv.session_start_sec = deg.session_start_sec
    ORDER BY iv.user_id, iv.session_start_sec
    """,
    doc=(
        "Session concurrency: 30-min-gap sessionization, then per-session "
        "count of overlapping sessions via the binned large×large "
        "interval self-join."
    ),
)
def events_session_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch ``session_window`` (gap 30 min ⇒ end = last event + 30 min,
    half-open) + operators/intervals.py interval_overlap_degree on the
    30-minute bin grid. Sessions of one user never overlap each other
    (the gap rule closes a session strictly before the next opens), so
    excluding identical (user_id, start) keys excludes exactly self."""
    from etl_mudah_spark.operators.intervals import interval_overlap_degree

    ev = load(spark, sf_dir, "events")
    iv = (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").cast("long").alias("session_start_sec"),
            F.col("w.start").alias("s"),
            F.col("w.end").alias("e"),
            "n_events",
        )
    )
    deg = interval_overlap_degree(
        iv,
        bin_seconds=1800,
        key_cols=["user_id", "session_start_sec"],
        start="s",
        end="e",
    )
    return (
        iv.join(deg, ["user_id", "session_start_sec"])
        .select("user_id", "session_start_sec", "n_events", "n_overlap")
        .orderBy("user_id", "session_start_sec")
    )


# ---------------------------------------------------------------------------
# Incremental view maintenance: refresh the per-priority orders
# aggregate by applying the CDC diff — the fact table's NEW snapshot is
# never aggregated. Spark computes base_agg(v1) + delta(diff); the
# oracle recomputes from v2 directly. Hash equality across engines IS
# the IVM correctness statement (incremental == recompute), including
# the hard case: repriced rows MIGRATE priority groups (debit old
# group, credit new) while also changing the measure. Scale: the
# refresh plan is three aggregate-sized shuffles — O(|changes|), not
# O(|fact|); at 100 TB that is the difference between a per-refresh
# full-table pass and a few seconds (see operators/ivm.py docstring).
# ---------------------------------------------------------------------------
@register(
    "orders_priority_agg_ivm",
    oracle="""
    WITH v2 AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 89 = 3 THEN '9-REPRICED'
                    ELSE o_orderpriority END AS o_orderpriority,
               CASE WHEN o_orderkey % 89 = 3
                    THEN CAST(o_totalprice AS DECIMAL(18,6)) + 1000
                    ELSE CAST(o_totalprice AS DECIMAL(18,6)) END AS tp
        FROM orders WHERE o_orderkey % 97 <> 0
        UNION ALL
        SELECT -o_orderkey, '1-URGENT', CAST(o_totalprice AS DECIMAL(18,6))
        FROM orders WHERE o_orderkey % 101 = 5
    )
    SELECT o_orderpriority, COUNT(*) AS cnt,
           CAST(SUM(tp) AS DOUBLE) AS total_price
    FROM v2 GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc=(
        "Incremental view maintenance: per-priority count/sum refreshed "
        "by applying the CDC diff to the old aggregate (oracle recomputes "
        "from the new snapshot — incremental == recompute, cross-engine)."
    ),
)
def orders_priority_agg_ivm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/ivm.py: summing_agg(v1) + table_diff(v1, v2) →
    agg(v2) without aggregating v2. The mutation exercises all three
    delta shapes: deletes (keys % 97 == 0), group-migrating updates
    with a measure change (% 89 == 3 → priority '9-REPRICED',
    price + 1000), and inserts (negative keys). Decimal measures per
    the functions/core.py exactness policy; final cast to double."""
    from etl_mudah_spark.operators.cdc import table_diff
    from etl_mudah_spark.operators.ivm import incremental_agg, summing_agg

    v1 = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.col("o_totalprice").cast(_DEC).alias("tp"),
    )
    key = F.col("o_orderkey")
    repriced = key % 89 == 3
    v2 = (
        v1.where(key % 97 != 0)
        .withColumn(
            "o_orderpriority",
            F.when(repriced, F.lit("9-REPRICED")).otherwise(
                F.col("o_orderpriority")
            ),
        )
        .withColumn("tp", F.when(repriced, F.col("tp") + 1000).otherwise(F.col("tp")))
        .unionByName(
            v1.where(key % 101 == 5).select(
                (-key).alias("o_orderkey"),
                F.lit("1-URGENT").alias("o_orderpriority"),
                "tp",
            )
        )
    )
    base = summing_agg(v1, ["o_orderpriority"], {"total_dec": "tp"})
    diff = table_diff(v1, v2, ["o_orderkey"], compare_cols=["o_orderpriority", "tp"])
    refreshed = incremental_agg(
        base, diff, ["o_orderpriority"], {"total_dec": "tp"}
    )
    return refreshed.select(
        "o_orderpriority",
        "cnt",
        F.col("total_dec").cast("double").alias("total_price"),
    ).orderBy("o_orderpriority")


# ---------------------------------------------------------------------------
# EWMA smoothing of the daily event series. The recursive definition
# s_t = α·x_t + (1−α)·s_{t−1} is a sequential scan — the wrong shape
# for a distributed engine — so we use the 30-term truncated closed
# form: s_t ≈ Σ_{j=0..29} α(1−α)^j · x_{t−j} (the tail beyond 30 days
# weighs (1−α)^30 ≈ 2e−5 — below the 4-dp output rounding). Weights
# are computed ONCE in Python and embedded as identical double
# literals in BOTH the Spark plan and the oracle SQL, so engine libm
# pow() differences can't leak into the comparison.
# ---------------------------------------------------------------------------
EWMA_ALPHA = 0.3
EWMA_SPAN = 30
_EWMA_W = [EWMA_ALPHA * (1 - EWMA_ALPHA) ** j for j in range(EWMA_SPAN)]
_EWMA_W_SQL = ", ".join(
    f"({j}, CAST({x!r} AS DOUBLE))" for j, x in enumerate(_EWMA_W)
)
_EWMA_W_ARR = "array(" + ", ".join(f"{x!r}D" for x in _EWMA_W) + ")"


@register(
    "events_daily_ewma",
    oracle=f"""
    WITH daily AS (
        SELECT date_trunc('day', ts) AS d, COUNT(*) AS n_events
        FROM events GROUP BY 1
    ), wt(j, w) AS (VALUES {_EWMA_W_SQL}),
    contrib AS (
        SELECT daily.d + to_days(j) AS d, n_events * w AS x
        FROM daily, wt
    ), sm AS (
        SELECT d, SUM(x) AS s FROM contrib GROUP BY d
    )
    SELECT daily.d, daily.n_events, ROUND(sm.s, 4) AS ewma30
    FROM daily JOIN sm USING (d)
    ORDER BY d
    """,
    doc=(
        "30-term truncated EWMA (alpha 0.3) of the daily event count "
        "series, shared-literal weights on both sides."
    ),
)
def events_daily_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted daily event volume — the trend line a
    monitoring pipeline overlays on raw counts. Distribution strategy:
    instead of a sequential recurrence or a per-row 30-day lookback
    join, each observed day SCATTERS its 30 weighted future
    contributions (explode of a 30-element literal zip — map-side,
    30× a daily-aggregate-sized relation, i.e. tiny) and a groupBy on
    the target day gathers them — one keyed shuffle, no window over an
    unpartitioned series, no range join. Days missing from the series
    contribute nothing (gap days are skipped, not zero-filled), and
    only observed days are emitted — both sides implement the same
    convention by construction.
    """
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").alias("d"))
        .agg(F.count("*").alias("n_events"))
    )
    warr = F.expr(_EWMA_W_ARR)
    contrib = daily.select(
        F.explode(F.sequence(F.lit(0), F.lit(EWMA_SPAN - 1))).alias("j"),
        "d",
        "n_events",
    ).select(
        F.expr("timestampadd(DAY, j, d)").alias("d"),
        (F.col("n_events") * F.element_at(warr, F.col("j") + 1)).alias("x"),
    )
    sm = contrib.groupBy("d").agg(F.sum("x").alias("s"))
    return (
        daily.join(sm, "d")
        .select("d", "n_events", F.round("s", 4).alias("ewma30"))
        .orderBy("d")
    )


@register(
    "daily_revenue_changepoint",
    oracle=f"""
    WITH daily AS (
        SELECT date_trunc('day', o_orderdate) AS d,
               {oracle_dsum('o_totalprice')} AS rev
        FROM orders GROUP BY 1
    ), stats AS (
        SELECT CAST(SUM(CAST(rev AS DECIMAL(18,6))) AS DOUBLE)
                   / COUNT(*) AS mu,
               COUNT(*) AS n_days
        FROM daily
    ), cusum AS (
        SELECT d, n_days,
               CAST(SUM(CAST(rev - mu AS DECIMAL(18,6)))
                        OVER (ORDER BY d) AS DOUBLE) AS s
        FROM daily CROSS JOIN stats
    )
    SELECT d AS changepoint_day,
           ROUND(s, 4) AS cusum_at_peak,
           CAST(n_days AS BIGINT) AS n_days
    FROM cusum
    ORDER BY ABS(s) DESC, d LIMIT 1
    """,
    doc=(
        "CUSUM changepoint: the day where the cumulative deviation of "
        "daily revenue from its mean peaks — the max-|S_t| point of "
        "the classic level-shift detector."
    ),
)
def daily_revenue_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Level-shift detection on the revenue series: S_t = Σ_{i≤t}
    (x_i − μ) peaks in magnitude at the most likely changepoint. The
    cumulative window runs over the POST-AGGREGATION day spine
    (O(calendar days) rows — the daily_revenue_moving_avg discipline),
    never over orders; deviations sum on the decimal lattice so the
    running sum is association-order-exact in both engines."""
    o = load(spark, sf_dir, "orders").select(
        F.date_trunc("day", "o_orderdate").alias("d"), "o_totalprice"
    )
    daily = o.groupBy("d").agg(dsum("o_totalprice").alias("rev"))
    stats = daily.agg(
        (F.sum(F.col("rev").cast(_DEC)).cast("double") / F.count("*")).alias("mu"),
        F.count("*").alias("n_days"),
    )
    w = W.orderBy("d").rowsBetween(W.unboundedPreceding, 0)
    cusum = daily.join(F.broadcast(stats)).withColumn(
        "s",
        F.sum((F.col("rev") - F.col("mu")).cast(_DEC)).over(w).cast("double"),
    )
    # rank on the UNROUNDED |s| (the oracle's ORDER BY ABS(s)); rounding
    # first could tie two near-peak days the oracle distinguishes.
    return (
        cusum.orderBy(F.abs(F.col("s")).desc(), "d")
        .limit(1)
        .select(
            F.col("d").alias("changepoint_day"),
            F.round("s", 4).alias("cusum_at_peak"),
            F.col("n_days").cast("bigint").alias("n_days"),
        )
    )


@register(
    "orders_dow_seasonality",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               dayofweek(o_orderdate) AS dow,
               COUNT(*) AS n
        FROM orders GROUP BY 1, 2
    ), per_dow AS (
        SELECT dow,
               CAST(SUM(n) AS DOUBLE) / COUNT(*) AS mean_daily_n,
               COUNT(*) AS n_days
        FROM daily GROUP BY dow
    ), overall AS (
        SELECT CAST(SUM(n) AS DOUBLE) / COUNT(*) AS grand_mean FROM daily
    )
    SELECT CAST(dow AS INT) AS dow, CAST(n_days AS BIGINT) AS n_days,
           mean_daily_n,
           mean_daily_n / grand_mean AS seasonal_index
    FROM per_dow CROSS JOIN overall
    ORDER BY dow
    """,
    doc=(
        "Day-of-week seasonal index of order volume: mean daily count "
        "per weekday over the grand daily mean (index 1.0 = no "
        "seasonality)."
    ),
)
def orders_dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multiplicative seasonal profile under every forecasting
    pipeline: mean daily volume per weekday normalized by the grand
    daily mean. Two bounded aggregations (days, then weekdays) and a
    1-row broadcast — integer counts make every ratio a single
    deterministic division. DuckDB dayofweek is 0=Sunday; Spark's
    dayofweek is 1=Sunday, so the engine side subtracts 1 to share
    the convention."""
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderdate").cast("date").alias("d")
    )
    daily = o.groupBy(
        "d", (F.dayofweek("d") - 1).cast("int").alias("dow")
    ).agg(F.count("*").alias("n"))
    per_dow = daily.groupBy("dow").agg(
        (F.sum("n").cast("double") / F.count("*")).alias("mean_daily_n"),
        F.count("*").cast("bigint").alias("n_days"),
    )
    overall = daily.agg(
        (F.sum("n").cast("double") / F.count("*")).alias("grand_mean")
    )
    return (
        per_dow.join(F.broadcast(overall))
        .select(
            "dow",
            "n_days",
            "mean_daily_n",
            (F.col("mean_daily_n") / F.col("grand_mean")).alias("seasonal_index"),
        )
        .orderBy("dow")
    )


# ---------------------------------------------------------------------------
# Autocorrelation: the seasonality detector underneath
# orders_dow_seasonality and events_daily_ewma — "is the daily series
# self-similar at lag k". Formulated as a SELF-JOIN on the shifted day
# key, not a window: after the daily aggregation the spine is
# O(calendar days), and the lag pairing is one broadcast-size equi-join
# per plan, so no global window (and no allowlist entry) is needed.
# Exactness: daily sums ride the decimal lattice; the mean is one exact
# division; every centered product is cast to decimal(18,6) before the
# lag sums, so partition order cannot perturb the quotient.
# ---------------------------------------------------------------------------
@register(
    "events_daily_acf",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               {oracle_dsum('value')} AS x
        FROM events GROUP BY 1
    ), stats AS (
        SELECT CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS mu,
               COUNT(*) AS n
        FROM daily
    ), dev AS (
        SELECT day, x - mu AS d FROM daily CROSS JOIN stats
    ), den AS (
        SELECT CAST(SUM(CAST(d * d AS DECIMAL(18,6))) AS DOUBLE) AS ss
        FROM dev
    ), lags AS (
        SELECT lag FROM UNNEST([1, 2, 3, 4, 5, 6, 7]) AS t(lag)
    ), num AS (
        SELECT l.lag,
               COUNT(*) AS n_pairs,
               CAST(SUM(CAST(a.d * b.d AS DECIMAL(18,6))) AS DOUBLE) AS sp
        FROM lags l
        JOIN dev a ON TRUE
        JOIN dev b ON b.day = a.day + CAST(l.lag AS INT)
        GROUP BY l.lag
    )
    SELECT CAST(lag AS INT) AS lag,
           CAST(n_pairs AS BIGINT) AS n_pairs,
           sp / den.ss AS acf
    FROM num CROSS JOIN den
    ORDER BY lag
    """,
    doc=(
        "Daily event-value autocorrelation at lags 1-7 (centered "
        "products on the exact decimal lattice) — the seasonality "
        "detector for the retrain-cadence decision."
    ),
)
def events_daily_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ACF of the daily value series at lags 1..7: r_k =
    Σ(x_t−μ)(x_{t+k}−μ) / Σ(x_t−μ)². One map-side-combined daily
    aggregation reduces the stream to O(days) rows; the lag pairing is
    a self-join on the shifted DAY KEY over that spine (explode of 7
    lag literals, then one equi-join) — no global window, no
    single-task sort, and the join is broadcast-sized at any corpus
    scale because the spine is calendar-bounded. The 1-row mean and
    denominator broadcasts are the sanctioned A13 shape."""
    ev = load(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("day"), "value"
    )
    daily = ev.groupBy("day").agg(dsum("value").alias("x"))
    stats = daily.agg(
        (F.sum(F.col("x").cast(_DEC)).cast("double") / F.count("*")).alias("mu"),
    )
    dev = daily.join(F.broadcast(stats)).select(
        "day", (F.col("x") - F.col("mu")).alias("d")
    )
    den = dev.agg(
        F.sum((F.col("d") * F.col("d")).cast("decimal(18,6)"))
        .cast("double")
        .alias("ss")
    )
    lags = F.explode(F.array(*[F.lit(k) for k in range(1, 8)])).alias("lag")
    a = dev.select(lags, "day", F.col("d").alias("da"))
    b = dev.select(F.col("day").alias("bday"), F.col("d").alias("db"))
    num = (
        a.join(b, F.col("bday") == F.date_add(F.col("day"), F.col("lag")))
        .groupBy("lag")
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.sum((F.col("da") * F.col("db")).cast("decimal(18,6)"))
            .cast("double")
            .alias("sp"),
        )
    )
    return (
        num.join(F.broadcast(den))
        .select(
            F.col("lag").cast("int").alias("lag"),
            "n_pairs",
            (F.col("sp") / F.col("ss")).alias("acf"),
        )
        .orderBy("lag")
    )


@register(
    "daily_revenue_theilsen",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               {oracle_dsum('value')} AS x
        FROM events GROUP BY 1
    ), keyed AS (
        SELECT ROW_NUMBER() OVER (ORDER BY day) AS t, day, x FROM daily
    ), slopes AS (
        SELECT (b.x - a.x) / (b.t - a.t) AS slope
        FROM keyed a JOIN keyed b ON b.t > a.t
    )
    SELECT CAST((SELECT COUNT(*) FROM keyed) AS BIGINT) AS n_days,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           MEDIAN(slope) AS theil_sen_slope
    FROM slopes
    """,
    doc=(
        "Theil-Sen robust trend of daily event value: the median of "
        "all pairwise slopes over the calendar spine — outlier-proof "
        "where the OLS line is one bad day away from nonsense."
    ),
)
def daily_revenue_theilsen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust trend estimation: the median pairwise slope is
    insensitive to up to ~29% outliers (breakdown point), unlike the
    least-squares slope one promo spike drags around. The pair space
    is O(days²) — a property of the CALENDAR, not the corpus (30 days
    → 435 pairs at any sf), so the all-pairs join is over the
    post-aggregation spine and is bounded forever; the corpus itself
    reduces to the daily sums in one map-side-combined aggregation.
    Day index t comes from a rank over the tiny spine; slopes are
    exact-decimal differences divided by int gaps; the median
    (exact percentile, both engines average the two middles on even
    counts) is the only order statistic."""
    ev = load(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("day"), "value"
    )
    daily = ev.groupBy("day").agg(dsum("value").alias("x"))
    # rank over the O(days) spine via the two-phase bucketed rank.
    # The bucket must be a monotone coarsening of the order key: a bare
    # month-of-year is NOT (Dec=12 of year Y sorts after Jan=1 of Y+1),
    # so use the year-month serial number, which stays order-preserving
    # across year boundaries while keeping the phase-2 cumsum at
    # O(months-in-span) rows.
    from etl_mudah_spark.operators.sampling import bucketed_global_rank

    keyed = bucketed_global_rank(
        daily,
        (F.year("day") * 12 + F.month("day")).cast("bigint"),
        ["day"],
        rn_col="t",
    )
    a = keyed.select(F.col("t").alias("ta"), F.col("x").alias("xa"))
    b = keyed.select(F.col("t").alias("tb"), F.col("x").alias("xb"))
    slopes = a.join(b, F.col("tb") > F.col("ta")).select(
        ((F.col("xb") - F.col("xa")) / (F.col("tb") - F.col("ta"))).alias(
            "slope"
        )
    )
    n_days = keyed.agg(F.count("*").cast("bigint").alias("n_days"))
    return (
        slopes.agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.median("slope").alias("theil_sen_slope"),
        )
        .join(F.broadcast(n_days))
        .select("n_days", "n_pairs", "theil_sen_slope")
    )


@register(
    "events_seasonal_backtest",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               {oracle_dsum('value')} AS x
        FROM events GROUP BY 1
    ), paired AS (
        SELECT a.day, a.x AS actual, b.x AS forecast
        FROM daily a JOIN daily b ON a.day = b.day + INTERVAL 7 DAY
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(CAST(abs(actual - forecast) AS DECIMAL(18,6)))
                AS DOUBLE) / COUNT(*) AS mae,
           CAST(SUM(CAST(abs(actual - forecast) / actual AS DECIMAL(18,6)))
                AS DOUBLE) * 100.0 / COUNT(*) AS mape_pct,
           CAST(SUM(CAST(2.0 * abs(actual - forecast)
                         / (abs(actual) + abs(forecast)) AS DECIMAL(18,6)))
                AS DOUBLE) * 100.0 / COUNT(*) AS smape_pct
    FROM paired
    """,
    doc=(
        "Seasonal-naive backtest: forecast each day with the value "
        "seven days earlier and score MAE / MAPE / sMAPE — the "
        "baseline every fancier forecaster must beat."
    ),
)
def events_seasonal_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The forecasting floor: f(d) = x(d−7). Any model that cannot
    beat this on the backtest window is noise — which is why the
    pipeline ships the baseline as a first-class query next to the
    EWMA/changepoint/seasonality family. The corpus reduces to the
    daily spine in one map-side-combined aggregation; the forecast
    pairing is one self-join on the shifted DAY KEY (calendar-bounded
    relation, no window); error sums ride the decimal lattice so the
    three scores are partition-order-exact in both engines."""
    ev = load(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("day"), "value"
    )
    daily = ev.groupBy("day").agg(dsum("value").alias("x"))
    a = daily.select(F.col("day"), F.col("x").alias("actual"))
    b = daily.select(
        F.date_add(F.col("day"), 7).alias("fday"), F.col("x").alias("forecast")
    )
    paired = a.join(b, a.day == b.fday)
    err = F.abs(F.col("actual") - F.col("forecast"))
    dsum6 = lambda c: F.sum(c.cast("decimal(18,6)")).cast("double")  # noqa: E731
    return paired.agg(
        F.count("*").cast("bigint").alias("n_days"),
        (dsum6(err) / F.count("*")).alias("mae"),
        (dsum6(err / F.col("actual")) * 100.0 / F.count("*")).alias("mape_pct"),
        (
            dsum6(
                2.0 * err / (F.abs(F.col("actual")) + F.abs(F.col("forecast")))
            )
            * 100.0
            / F.count("*")
        ).alias("smape_pct"),
    )


@register(
    "priority_monthly_trend_ols",
    oracle="""
    WITH cells AS (
        SELECT o_orderpriority AS pr,
               (year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1 AS x,
               COUNT(*) AS y
        FROM orders GROUP BY 1, 2
    ), s AS (
        SELECT pr, CAST(COUNT(*) AS BIGINT) AS n,
               SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
               SUM(x * x) AS sxx, SUM(y * y) AS syy
        FROM cells GROUP BY pr
    )
    SELECT pr AS o_orderpriority, n,
           (n * sxy - sx * sy) * 1.0 / NULLIF(n * sxx - sx * sx, 0)
               AS slope,
           (sy - ((n * sxy - sx * sy) * 1.0 / NULLIF(n * sxx - sx * sx, 0))
                 * sx) / n AS intercept,
           ((n * sxy - sx * sy) * 1.0 / NULLIF(n * sxx - sx * sx, 0))
             * ((n * sxy - sx * sy) * 1.0 / NULLIF(n * syy - sy * sy, 0))
               AS r2
    FROM s ORDER BY o_orderpriority
    """,
    doc=(
        "Per-priority OLS trend of monthly order volume: closed-form "
        "slope/intercept/R2 from exact integer normal-equation sums — "
        "is each priority class growing, and how linearly?"
    ),
)
def priority_monthly_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped linear regression without mllib and without a solver
    (ml/metrics.ols_fit_grouped): the monthly count spine is exact
    integers, so Σx/Σy/Σxy/Σx²/Σy² are partition-order-exact bigints
    and slope/R² are one-or-two divisions — identical doubles in any
    engine, no iteration, no lattice. Two hash aggregations total
    (orders → bounded (priority, month) cells → 5 priority rows); x is
    the compact month index from the 1995 epoch, keeping every product
    far from the bigint edge. The Theil-Sen query is the robust twin;
    this is the classical fit with the variance-explained diagnostic."""
    from etl_mudah_spark.ml.metrics import ols_fit_grouped

    orders = load(spark, sf_dir, "orders").select(
        F.col("o_orderpriority"),
        (
            (F.year("o_orderdate") - 1995) * 12 + F.month("o_orderdate") - 1
        ).alias("x"),
    )
    cells = orders.groupBy("o_orderpriority", "x").agg(
        F.count("*").alias("y")
    )
    return ols_fit_grouped(
        cells, ["o_orderpriority"], "x", "y"
    ).orderBy("o_orderpriority")


@register(
    "events_conformal_interval",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, {oracle_dsum('value')} AS x
        FROM events GROUP BY 1
    ), paired AS (
        SELECT a.day AS day, abs(a.x - b.x) AS err
        FROM daily a JOIN daily b ON a.day = b.day + INTERVAL 7 DAY
    ), cal AS (
        SELECT * FROM paired WHERE day < DATE '2024-01-22'
    ), tst AS (
        SELECT * FROM paired WHERE day >= DATE '2024-01-22'
    ), nc AS (
        SELECT COUNT(*) AS n_cal,
               ((COUNT(*) + 1) * 4 + 4) // 5 AS k FROM cal
    ), r AS (
        SELECT err, ROW_NUMBER() OVER (ORDER BY err, day) AS rn FROM cal
    ), q AS (
        SELECT nc.n_cal, nc.k, r.err AS q_alpha
        FROM r JOIN nc ON r.rn = nc.k
    )
    SELECT CAST(q.n_cal AS BIGINT) AS n_cal,
           CAST(q.k AS BIGINT) AS k_rank,
           q.q_alpha,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           CAST(SUM(CASE WHEN tst.err <= q.q_alpha THEN 1 ELSE 0 END)
                AS BIGINT) AS n_covered,
           SUM(CASE WHEN tst.err <= q.q_alpha THEN 1 ELSE 0 END) * 100.0
               / COUNT(*) AS coverage_pct
    FROM tst CROSS JOIN q
    GROUP BY 1, 2, 3
    """,
    doc=(
        "Split-conformal interval for the seasonal-naive forecaster: "
        "the ceil(0.8*(n+1))-th smallest calibration residual becomes "
        "the +/- band; empirical coverage is scored on the held-out "
        "final week."
    ),
)
def events_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-free uncertainty for the forecasting family: take
    the seasonal-naive residuals |x(d) − x(d−7)| on a calibration
    window (Jan 8–21), pick the ⌈(n+1)(1−α)⌉-th smallest (α = 0.2 —
    the split-conformal quantile, computed with INTEGER arithmetic
    ((n+1)·4+4) div 5, never ceil(0.8·(n+1)) whose float product can
    land on 12.000000000000002), then measure what fraction of the
    held-out week's residuals the band actually covers — conformal
    guarantees ≥ 80% on exchangeable data, and the query emits the
    observed rate next to the promise. All arithmetic is exact:
    residuals come off decimal-lattice daily sums, rank ties break on
    the day key, coverage is a count ratio. The ranking window runs
    over the O(calendar-days) post-aggregation spine (like
    daily_revenue_moving_avg); the quantile and totals fold in as
    1-row broadcasts."""
    ev = load(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("day"), "value"
    )
    daily = ev.groupBy("day").agg(dsum("value").alias("x"))
    a = daily.select("day", F.col("x").alias("actual"))
    b = daily.select(
        F.date_add(F.col("day"), 7).alias("fday"), F.col("x").alias("forecast")
    )
    paired = a.join(b, a.day == b.fday).select(
        a.day.alias("day"),
        F.abs(F.col("actual") - F.col("forecast")).alias("err"),
    )
    split = F.lit("2024-01-22").cast("date")
    cal = paired.where(F.col("day") < split)
    tst = paired.where(F.col("day") >= split)
    nc = cal.agg(
        F.count("*").cast("bigint").alias("n_cal"),
        F.expr("((count(*) + 1) * 4 + 4) div 5").cast("bigint").alias("k"),
    )
    ranked = cal.withColumn(
        "rn",
        F.row_number().over(W.orderBy("err", "day")).cast("bigint"),
    )
    q = (
        ranked.join(F.broadcast(nc))
        .where(F.col("rn") == F.col("k"))
        .select("n_cal", F.col("k").alias("k_rank"), F.col("err").alias("q_alpha"))
    )
    covered = F.sum(
        F.when(F.col("err") <= F.col("q_alpha"), 1).otherwise(0)
    ).cast("bigint")
    return (
        tst.join(F.broadcast(q))
        .groupBy("n_cal", "k_rank", "q_alpha")
        .agg(
            F.count("*").cast("bigint").alias("n_test"),
            covered.alias("n_covered"),
        )
        .select(
            "n_cal",
            "k_rank",
            "q_alpha",
            "n_test",
            "n_covered",
            (F.col("n_covered") * 100.0 / F.col("n_test")).alias(
                "coverage_pct"
            ),
        )
    )


@register(
    "customer_km_survival",
    oracle="""
    WITH per AS (
        SELECT o_custkey,
               CAST(datediff('day', MIN(o_orderdate), MAX(o_orderdate))
                    AS INT) AS dur,
               CASE WHEN MAX(o_orderdate) < TIMESTAMP '2001-01-01'
                    THEN 1 ELSE 0 END AS ev
        FROM orders GROUP BY o_custkey
    ), g AS (
        SELECT dur AS t, SUM(ev) AS d, SUM(1 - ev) AS c,
               COUNT(*) AS tot
        FROM per GROUP BY dur
    ), n AS (
        SELECT COUNT(*) AS n FROM per
    ), w AS (
        SELECT t, d, c, tot,
               n.n - (SUM(tot) OVER (ORDER BY t) - tot) AS risk
        FROM g CROSS JOIN n
    ), lt AS (
        SELECT t, d, c, risk,
               CAST(CASE WHEN d > 0 AND d < risk
                         THEN ln(1.0 - d * 1.0 / risk)
                         ELSE 0.0 END AS DECIMAL(18,6)) AS lnt,
               CASE WHEN d = risk THEN 1 ELSE 0 END AS tf
        FROM w
    ), cum AS (
        SELECT t, risk, d, c,
               SUM(lnt) OVER (ORDER BY t) AS cumln,
               SUM(tf) OVER (ORDER BY t) AS cumtf
        FROM lt
    )
    SELECT t, CAST(risk AS BIGINT) AS n_risk,
           CAST(d AS BIGINT) AS d_events,
           CAST(c AS BIGINT) AS n_censored,
           CASE WHEN cumtf > 0 THEN 0.0
                ELSE exp(CAST(cumln AS DOUBLE)) END AS survival
    FROM cum ORDER BY t
    """,
    doc=(
        "Kaplan-Meier churn-lifetime curve: per-customer active span "
        "(first to last order), churn observed before the 2001 "
        "horizon vs censored, S(t) over exact at-risk counts."
    ),
)
def customer_km_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-event analysis joins the engine's evaluation tier
    (ml/metrics.km_survival): each customer's active lifetime runs
    first-order to last-order; customers whose last order predates
    the 2001-01-01 horizon are observed churns, later ones are
    right-censored — the estimator handles the censoring instead of
    silently dropping those customers (the bias naive churn averages
    carry). The at-risk denominators are exact integers off one
    reverse prefix sum; the survival product rides exp of
    decimal-lattice ln sums so every S(t) is partition-order-exact;
    a duration that exhausts the risk set drops S to literal 0.0 via
    an integer flag, never ln(0). One cohort aggregation + three
    two-phase bucketed cumulative passes over the distinct-duration
    relation — no window over data."""
    from etl_mudah_spark.ml.metrics import km_survival

    per = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.datediff(F.max("o_orderdate"), F.min("o_orderdate")).alias(
                "dur"
            ),
            (
                F.max("o_orderdate")
                < F.lit("2001-01-01 00:00:00").cast("timestamp")
            )
            .cast("int")
            .alias("ev"),
        )
    )
    return km_survival(per, "dur", "ev")


@register(
    "segment_churn_logrank",
    oracle="""
    WITH per AS (
        SELECT o.o_custkey,
               CAST(datediff('day', MIN(o.o_orderdate), MAX(o.o_orderdate))
                    AS INT) AS dur,
               CASE WHEN MAX(o.o_orderdate) < TIMESTAMP '2001-01-01'
                    THEN 1 ELSE 0 END AS ev,
               CASE WHEN MAX(c.c_mktsegment) = 'BUILDING'
                    THEN 1 ELSE 0 END AS grp
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY o.o_custkey
    ), g AS (
        SELECT dur AS t,
               SUM(grp * ev) AS da, SUM((1 - grp) * ev) AS db,
               SUM(grp) AS ta, SUM(1 - grp) AS tb
        FROM per GROUP BY dur
    ), c1 AS (
        SELECT t, da, db, ta, tb,
               SUM(ta) OVER (ORDER BY t) AS cuma,
               SUM(tb) OVER (ORDER BY t) AS cumb
        FROM g
    ), tt AS (
        SELECT SUM(ta) AS na, SUM(tb) AS nb,
               SUM(da) AS ea, SUM(db) AS eb FROM g
    ), terms AS (
        SELECT da, db,
               (tt.na - (cuma - ta)) AS ra,
               (tt.nb - (cumb - tb)) AS rb
        FROM c1 CROSS JOIN tt WHERE da + db > 0
    ), v AS (
        SELECT CAST(SUM(CAST(
                   da - (da + db) * (ra * 1.0 / (ra + rb))
               AS DECIMAL(18,6))) AS DOUBLE) AS ome,
               CAST(SUM(CAST(
                   CASE WHEN ra + rb > 1
                        THEN (da + db) * (ra * 1.0 / (ra + rb))
                             * (1.0 - ra * 1.0 / (ra + rb))
                             * ((ra + rb) - (da + db)) * 1.0
                             / ((ra + rb) - 1)
                        ELSE 0.0 END
               AS DECIMAL(18,6))) AS DOUBLE) AS var
        FROM terms
    )
    SELECT CAST(tt.na AS BIGINT) AS n_a, CAST(tt.nb AS BIGINT) AS n_b,
           CAST(tt.ea AS BIGINT) AS events_a,
           CAST(tt.eb AS BIGINT) AS events_b,
           v.ome AS o_minus_e, v.var AS variance,
           (v.ome * v.ome) / NULLIF(v.var, 0) AS chi2
    FROM tt CROSS JOIN v
    """,
    doc=(
        "Two-sample log-rank test: do BUILDING-segment customers "
        "churn on a different schedule than the rest? O-E and "
        "hypergeometric variance over the pooled event times, "
        "censoring-aware."
    ),
)
def segment_churn_logrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hypothesis test beside the KM curve
    (ml/metrics.logrank_test): comparing raw churn rates between
    segments ignores censoring and WHEN churn happens; the log-rank
    statistic compares the full hazard schedules. Group A =
    c_mktsegment 'BUILDING' (max() over the 1:1 join keeps the
    aggregation single-pass); at-risk counts per group come from two
    bucketed cumulative passes over the distinct-duration relation;
    every O−E and variance term is count-ratio arithmetic on exact
    bigints, lattice-summed — chi2 is two closed-form operations on
    engine-identical doubles. One join, two aggregations, no window
    over data."""
    from etl_mudah_spark.ml.metrics import logrank_test

    orders = load(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    per = (
        orders.join(cust, "o_custkey")
        .groupBy("o_custkey")
        .agg(
            F.datediff(F.max("o_orderdate"), F.min("o_orderdate")).alias(
                "dur"
            ),
            (
                F.max("o_orderdate")
                < F.lit("2001-01-01 00:00:00").cast("timestamp")
            )
            .cast("int")
            .alias("ev"),
            (F.max("c_mktsegment") == "BUILDING").alias("grp"),
        )
    )
    return logrank_test(per, "dur", "ev", "grp")
