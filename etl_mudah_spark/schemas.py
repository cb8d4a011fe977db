"""Declared StructTypes — the engine's single source of schema truth.

The reference declares each schema twice (DDL at dags/dag.py:296-321 vs
the implicit flattening dict at dags/dag.py:117-135) and reconciles by
hand, with column-order coupling that is load-bearing (SURVEY.md §1.3).
Here every table has exactly one StructType; writes validate against it.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Raw API page: shape of one search response page (consumed at
# dags/dag.py:145; fields read at dags/dag.py:112-135). Nested
# attributes.mileage struct per dags/dag.py:115,124-125.
# ---------------------------------------------------------------------------
MILEAGE = T.StructType(
    [
        T.StructField("gte", T.StringType()),
        T.StructField("lte", T.StringType()),
    ]
)

LISTING_ATTRIBUTES = T.StructType(
    [
        T.StructField("subject", T.StringType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("make_name", T.StringType()),
        T.StructField("model_name", T.StringType()),
        T.StructField("manufactured_year", T.StringType()),  # string, often junk
        T.StructField("mileage", MILEAGE),
        T.StructField("transmission_name", T.StringType()),
        T.StructField("fueltype", T.StringType()),
        T.StructField("car_type", T.StringType()),
        T.StructField("name", T.StringType()),  # seller
        T.StructField("region_name", T.StringType()),
        T.StructField("date", T.StringType()),  # timestamp-ish string
        T.StructField("image_count", T.IntegerType()),
        T.StructField("adview_url", T.StringType()),
        T.StructField("region_id", T.StringType()),
    ]
)

API_LISTING = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("attributes", LISTING_ATTRIBUTES),
    ]
)

API_PAGE = T.StructType([T.StructField("data", T.ArrayType(API_LISTING))])

# Motorcycle page shape (dags/motor_dag.py:81-98): make/model come from
# motorcycle_make_name / motorcycle_model_name and there is NO mileage
# struct and no transmission/fueltype/car_type attributes.
MOTOR_LISTING_ATTRIBUTES = T.StructType(
    [
        T.StructField("subject", T.StringType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("motorcycle_make_name", T.StringType()),
        T.StructField("motorcycle_model_name", T.StringType()),
        T.StructField("manufactured_year", T.StringType()),
        T.StructField("name", T.StringType()),  # seller
        T.StructField("region_name", T.StringType()),
        T.StructField("date", T.StringType()),
        T.StructField("image_count", T.IntegerType()),
        T.StructField("adview_url", T.StringType()),
        T.StructField("region_id", T.StringType()),
    ]
)

API_MOTOR_LISTING = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("attributes", MOTOR_LISTING_ATTRIBUTES),
    ]
)

# ---------------------------------------------------------------------------
# car_listings: DDL at dags/dag.py:297-318 (17 business columns).
# price NUMERIC → DecimalType(12,2) (exact money); year kept as string at
# ingest (validated later by rlike + try_cast, data_loader.py:28,60).
# ---------------------------------------------------------------------------
CAR_LISTINGS = T.StructType(
    [
        T.StructField("listing_id", T.LongType(), False),
        T.StructField("title", T.StringType(), False),
        T.StructField("price", T.DecimalType(12, 2)),
        T.StructField("make", T.StringType()),
        T.StructField("model", T.StringType()),
        T.StructField("year", T.StringType()),
        T.StructField("mileage_min", T.StringType()),
        T.StructField("mileage_max", T.StringType()),
        T.StructField("transmission", T.StringType()),
        T.StructField("fuel_type", T.StringType()),
        T.StructField("car_type", T.StringType()),
        T.StructField("location", T.StringType()),
        T.StructField("seller_name", T.StringType()),
        T.StructField("listing_date", T.TimestampType()),
        T.StructField("image_count", T.IntegerType()),
        T.StructField("ad_url", T.StringType()),
        T.StructField("region_id", T.StringType()),
        T.StructField("created_at", T.TimestampType()),
        T.StructField("updated_at", T.TimestampType()),
    ]
)

# motorcycle_listings: DDL at dags/motor_dag.py:274-290 (no mileage/
# transmission/fuel/car_type columns).
MOTORCYCLE_LISTINGS = T.StructType(
    [f for f in CAR_LISTINGS.fields if f.name not in
     {"mileage_min", "mileage_max", "transmission", "fuel_type", "car_type"}]
)

# Geo dimension (streamlit/utils/constants.py:2-24 + state synonyms at
# pages/regional_analysis.py:15-32) — a broadcast dim table.
STATES_DIM = T.StructType(
    [
        T.StructField("state", T.StringType(), False),
        T.StructField("lat", T.DoubleType()),
        T.StructField("lon", T.DoubleType()),
        T.StructField("synonyms", T.ArrayType(T.StringType())),
    ]
)

# Multimodal sample: opaque binary payload + typed metadata (SURVEY §7.2
# step 8 / BASELINE.json north star).
MEDIA_ASSETS = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("codec", T.StringType()),
    ]
)
