"""Geo dimension (S9) + location standardization (J3) + broadcast geo
join (J2) over the real Malaysian states surface.

(The driver-checked value twin is the registered state_market_stats
query in plans/geoq.py; these tests pin the GeoJSON parse and the
reference's exact synonym semantics, regional_analysis.py:15-32.)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_mudah_spark.sources.geo import (
    LOCATION_SYNONYMS,
    STATES_GEOJSON,
    load_states_dim,
    standardize_state,
)


def test_states_dim_parses_geojson(spark):
    dim = load_states_dim(spark)
    rows = {r["state"]: r for r in dim.collect()}
    assert len(rows) == 16
    assert abs(rows["Pulau Pinang"]["lat"] - 5.4141) < 1e-9
    assert abs(rows["Pulau Pinang"]["lon"] - 100.3288) < 1e-9
    # synonyms ride along on the dim row
    assert set(rows["Pulau Pinang"]["synonyms"]) == {"Penang", "P. Pinang"}
    assert set(rows["W.P. Kuala Lumpur"]["synonyms"]) == {
        "KL",
        "Kuala Lumpur",
        "Federal Territory of Kuala Lumpur",
    }


def test_standardize_state_matches_reference_mapping(spark):
    messy = spark.createDataFrame(
        [("Penang",), ("P. Pinang",), ("Pulau Pinang",), ("KL",),
         ("Kuala Lumpur",), ("Malacca",), ("Johor",), ("Nowhere",)],
        "location string",
    )
    got = {
        r["location"]: r["state"]
        for r in messy.select(
            "location", standardize_state(F.col("location")).alias("state")
        ).collect()
    }
    assert got["Penang"] == got["P. Pinang"] == got["Pulau Pinang"] == "Pulau Pinang"
    assert got["KL"] == got["Kuala Lumpur"] == "W.P. Kuala Lumpur"
    assert got["Malacca"] == "Melaka"
    assert got["Johor"] == "Johor"  # canonical passes through
    assert got["Nowhere"] == "Nowhere"  # identity fallback, like the reference


def test_regional_stats_broadcast_join(spark):
    """The regional_analysis.py:47-53 shape: standardize -> broadcast
    geo join -> per-state stats; the dim side must be broadcast."""
    listings = spark.createDataFrame(
        [("Penang", 50000.0), ("P. Pinang", 70000.0), ("Pulau Pinang", 60000.0),
         ("KL", 90000.0), ("Kuala Lumpur", 110000.0), ("Johor", 40000.0)],
        "location string, price double",
    )
    dim = load_states_dim(spark)
    stats = (
        listings.select(
            standardize_state(F.col("location")).alias("state"), "price"
        )
        .join(F.broadcast(dim.select("state", "lat", "lon")), "state")
        .groupBy("state", "lat", "lon")
        .agg(
            F.count("*").alias("listing_count"),
            F.round(F.avg("price"), 2).alias("avg_price"),
        )
    )
    plan = stats._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    rows = {r["state"]: r for r in stats.collect()}
    # all three Penang spellings collapse into ONE state row
    assert rows["Pulau Pinang"]["listing_count"] == 3
    assert rows["Pulau Pinang"]["avg_price"] == 60000.0
    assert rows["W.P. Kuala Lumpur"]["listing_count"] == 2
    assert abs(rows["W.P. Kuala Lumpur"]["lat"] - 3.1390) < 1e-9
    assert len(rows) == 3


def test_geojson_fixture_shape():
    """The vendored fixture matches the DOSM layout the reference keys
    on (featureidkey='properties.state', regional_analysis.py:80)."""
    assert STATES_GEOJSON["type"] == "FeatureCollection"
    for feat in STATES_GEOJSON["features"]:
        assert feat["properties"]["state"]
        assert feat["geometry"]["type"] == "Point"
    assert all(v in {f["properties"]["state"] for f in STATES_GEOJSON["features"]}
               for v in LOCATION_SYNONYMS.values())
