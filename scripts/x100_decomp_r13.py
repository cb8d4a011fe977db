"""Round-13 x100 experiments (VERDICT r12 items 3, 4, 6):

big_orders_preagg (item 3, "finish to <=2x in-series"):
  a. read the ACTUAL x100 plan of the preagg query — are both joins
     broadcast after AQE, or does the orders side go sort-merge?
  b. baseline timing (rollup prebuilt untimed, as the bench runs it);
  c. lever: rollup written SORTED by qty_sum — parquet row-group
     min/max stats turn the HAVING filter into a near-total row-group
     skip (zone maps; the sort is free at refresh time because IVM
     rewrites the rollup per version anyway);
  d. lever: orders pre-projected to the 4 consumed columns before the
     join (tests whether scan-side pruning already does this);
  e. DuckDB-from-raw twin for the ratio.

q18 IVM refresh (item 4): bench_q18_ivm_refresh at the same staged
point — the maintenance cost next to the query it serves, plus the
from-scratch rebuild for the refresh-vs-rebuild note.

doc_shard_pack_global x100 (item 6): first read of the shuffle-bound
doc-tier series + its DuckDB twin.

Run SOLO; results go to BASELINE.md round-13 notes. Methodology: fresh
DataFrame per rep (never re-collect the same object — shuffle reuse),
median-of-3.
"""
import os
import shutil
import statistics
import sys
import tempfile
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.chdir(_ROOT)

import bench  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from etl_mudah_spark.session import get_spark  # noqa: E402
from etl_mudah_spark.tables import load  # noqa: E402

print("loadavg:", [round(x, 2) for x in os.getloadavg()], flush=True)
spark = get_spark("x100-r13")
scratch = tempfile.mkdtemp(prefix="x100r13_")
spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def timed(label, fn, reps=3):
    ts = []
    out = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        ts.append(round(time.perf_counter() - t0, 3))
    print(f"{label:46s} med {statistics.median(ts):7.3f} s  {ts}  -> {out}",
          flush=True)
    return statistics.median(ts)


def q18_from_rollup(rollup_path, orders, cust):
    q = spark.read.parquet(rollup_path).where(F.col("qty_sum") > 250)
    return (
        q.join(orders, q.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                "o_totalprice", "qty_sum")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


try:
    sc_dir, sc_bytes = bench.stage_scaled(
        spark, "/root/testdata/sf0.1", scratch, factor=100,
        tables=["customer", "orders", "lineitem", "documents"],
        target_bytes=64 * 1024 * 1024, cap=64,
        row_group_bytes=16 * 1024 * 1024,
    )
    print(f"staged x100: {sc_bytes/1e9:.2f} GB", flush=True)

    # ---- rollup variants (built untimed) ----
    rollup = bench._prebuild_preagg(spark, sc_dir)
    n_rollup = spark.read.parquet(rollup).count()
    n_surv = (
        spark.read.parquet(rollup).where(F.col("qty_sum") > 250).count()
    )
    print(f"rollup rows {n_rollup:,}; survivors(>250) {n_surv:,}", flush=True)

    sorted_rollup = f"{scratch}/rollup_sorted"
    (
        spark.read.parquet(rollup)
        .repartitionByRange(16, "qty_sum")
        .sortWithinPartitions("qty_sum")
        .write.parquet(sorted_rollup)
    )

    orders = load(spark, sc_dir, "orders")
    cust = load(spark, sc_dir, "customer")
    orders_proj = orders.select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )

    # ---- (a) the actual plan, post-AQE ----
    df = q18_from_rollup(rollup, orders, cust)
    df.collect()  # materialize so AQE finalizes
    plan = df._jdf.queryExecution().executedPlan().toString()
    joins = [ln.strip()[:110] for ln in plan.splitlines()
             if "Join" in ln or "Exchange" in ln]
    print("x100 preagg plan join/exchange lines:", flush=True)
    for ln in joins:
        print("   ", ln, flush=True)

    # ---- (b,c,d) timings, fresh plans per rep ----
    timed("preagg baseline",
          lambda: q18_from_rollup(rollup, load(spark, sc_dir, "orders"),
                                  load(spark, sc_dir, "customer")).collect()
          and None)
    timed("preagg sorted-rollup (zone-map skip)",
          lambda: q18_from_rollup(sorted_rollup,
                                  load(spark, sc_dir, "orders"),
                                  load(spark, sc_dir, "customer")).collect()
          and None)
    timed("preagg sorted + orders pre-projected",
          lambda: q18_from_rollup(
              sorted_rollup,
              load(spark, sc_dir, "orders").select(
                  "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"),
              load(spark, sc_dir, "customer")).collect() and None)

    # ---- (e) DuckDB twins ----
    ddb = bench.run_duckdb(
        sc_dir, ["big_orders", "big_orders_preagg", "doc_shard_pack_global"],
        32,
    )
    print("duckdb-from-raw:", ddb, flush=True)

    # ---- IVM refresh + rebuild ----
    t = timed("q18 ivm refresh (bench fn, min-of-2+warm)",
              lambda: bench.bench_q18_ivm_refresh(spark, sc_dir), reps=1)
    timed("q18 rollup full rebuild (write)",
          lambda: load(spark, sc_dir, "lineitem")
          .groupBy("l_orderkey")
          .agg(F.count("*").alias("cnt"),
               F.sum(F.coalesce(F.col("l_quantity"), F.lit(0))).alias("qty_sum"))
          .write.mode("overwrite").parquet(f"{scratch}/rebuild")
          or None)

    # ---- doc_shard_pack_global at x100 ----
    from etl_mudah_spark.plans import registry
    fn = registry.REGISTRY["doc_shard_pack_global"].spark_fn
    timed("doc_shard_pack_global x100",
          lambda: fn(spark, sc_dir).collect() and None)
finally:
    shutil.rmtree(scratch, ignore_errors=True)
    print("loadavg end:", [round(x, 2) for x in os.getloadavg()], flush=True)
