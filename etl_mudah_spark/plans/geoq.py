"""Geo/regional analysis queries (SURVEY §2 S9 + J2 + J3).

Reference shape: pages/regional_analysis.py:15-95 — standardize messy
listing locations to canonical state names (synonym map), then group
per state and join the geo dimension for the choropleth (count, mean,
median, std per region). The Malaysian states dim itself is exercised
with real state synonyms in tests/test_geo.py (sources/geo.py); the
driver-checked twin here runs the same plan shape over the testdata's
``customer``/``nation`` tables so DuckDB can verify values:

- messy location strings are derived deterministically from the data
  (lowercase variants + ``N<k>`` abbreviations — the 'Penang'/'KL'
  role),
- standardization = upper + literal-map remap (functions/core.py
  synonym_remap; zero UDF, stays in codegen),
- the geo dim (25 rows) joins as a BROADCAST side — a geo dim is
  always tiny relative to the fact table; shuffling the fact on
  state would be wasted I/O at 100 TB,
- per-state stats mirror location_stats (regional_analysis.py:47-53):
  count / mean / median / sample-std.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_mudah_spark.functions.core import davg, oracle_davg, synonym_remap
from etl_mudah_spark.plans.registry import register
from etl_mudah_spark.tables import load

# Synthetic geo centroids for the testdata's 25 nations (the
# constants.py:2-24 role). Deterministic formula, shared verbatim with
# the oracle's VALUES list below.
NATION_GEO: list[tuple[str, float, float]] = [
    (f"NATION_{i}", round(-30.0 + i * 2.5, 2), round((i * 14.4) % 360 - 180.0, 2))
    for i in range(25)
]

# 'N7' -> 'NATION_7' (the 'KL' -> 'W.P. Kuala Lumpur' role).
NATION_SYNONYMS: dict[str, str] = {f"N{i}": f"NATION_{i}" for i in range(25)}

_GEO_VALUES = ",\n        ".join(
    f"('{s}', {lat}, {lon})" for s, lat, lon in NATION_GEO
)


@register(
    "state_market_stats",
    oracle=f"""
    WITH geo(state, lat, lon) AS (VALUES
        {_GEO_VALUES}
    ), messy AS (
        SELECT c_acctbal,
               CASE WHEN c_custkey % 5 = 0 THEN 'N' || substr(n_name, 8)
                    WHEN c_custkey % 3 = 0 THEN lower(n_name)
                    ELSE n_name END AS reported
        FROM customer JOIN nation ON c_nationkey = n_nationkey
    ), std AS (
        SELECT c_acctbal,
               CASE WHEN upper(reported) SIMILAR TO 'N[0-9]+'
                    THEN 'NATION_' || substr(upper(reported), 2)
                    ELSE upper(reported) END AS state
        FROM messy
    )
    SELECT g.state, g.lat, g.lon,
           COUNT(*) AS cnt,
           {oracle_davg('c_acctbal')} AS avg_bal,
           ROUND(MEDIAN(c_acctbal), 4) AS median_bal,
           ROUND(STDDEV(c_acctbal), 4) AS std_bal
    FROM std JOIN geo g ON std.state = g.state
    GROUP BY g.state, g.lat, g.lon
    """,
    doc="Regional market stats: messy locations standardized, broadcast geo join.",
)
def state_market_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_acctbal")
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    geo = spark.createDataFrame(NATION_GEO, "state string, lat double, lon double")
    reported = (
        F.when(F.col("c_custkey") % 5 == 0, F.concat(F.lit("N"), F.substring("n_name", 8, 16)))
        .when(F.col("c_custkey") % 3 == 0, F.lower("n_name"))
        .otherwise(F.col("n_name"))
    )
    state = synonym_remap(F.upper(reported), NATION_SYNONYMS)
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select(F.col("c_acctbal"), state.alias("state"))
        .join(F.broadcast(geo), "state")
        .groupBy("state", "lat", "lon")
        .agg(
            F.count("*").alias("cnt"),
            davg("c_acctbal").alias("avg_bal"),
            F.round(F.median("c_acctbal"), 4).alias("median_bal"),
            F.round(F.stddev("c_acctbal"), 4).alias("std_bal"),
        )
    )
