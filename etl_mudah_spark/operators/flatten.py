"""Nested-JSON flattening + cleaning for the listings pipeline.

Reference parity (file:line into /root/reference/):
- flatten/rename (P1): dags/dag.py:112-135 — attributes.subject→title,
  attributes.mileage.gte→mileage_min, etc.
- default coalesce (P2): dags/dag.py:119-134 — missing → '', 0, '0'.
- cleaning/derivation (F1-F3, P5, P12): data_loader.py:58-66 —
  try-cast numerics, 4-digit-year filter, age (parameterized as_of —
  the reference's wall-clock now() is a documented nondeterminism,
  SURVEY §4), mileage midpoint.

Everything is a Column projection — a single codegen stage over the
raw source, no UDFs, no shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

YEAR_RE = r"^[0-9]{4}$"  # data_loader.py:28


def flatten_listings(raw: DataFrame, vehicle_type: str = "car") -> DataFrame:
    """API page rows (id, attributes struct) → flat listing columns.

    Mirrors process_listing as one projection. The field mapping is
    per vehicle type: cars (dags/dag.py:112-135) read make_name /
    model_name plus the mileage struct and transmission/fuel/car_type;
    motorcycles (dags/motor_dag.py:81-98) read motorcycle_make_name /
    motorcycle_model_name and have none of those extras.
    """
    a = "attributes"
    if vehicle_type == "car":
        make_field, model_field = "make_name", "model_name"
    elif vehicle_type == "motorcycle":
        make_field, model_field = "motorcycle_make_name", "motorcycle_model_name"
    else:
        raise ValueError(f"unknown vehicle_type {vehicle_type!r}")
    cols = [
        F.col("id").alias("listing_id"),
        F.coalesce(F.col(f"{a}.subject"), F.lit("")).alias("title"),
        F.coalesce(F.col(f"{a}.price"), F.lit(0.0)).cast("decimal(12,2)").alias("price"),
        F.col(f"{a}.{make_field}").alias("make"),
        F.col(f"{a}.{model_field}").alias("model"),
        F.col(f"{a}.manufactured_year").alias("year"),
    ]
    if vehicle_type == "car":
        cols += [
            F.coalesce(F.col(f"{a}.mileage.gte"), F.lit("0")).alias("mileage_min"),
            F.coalesce(F.col(f"{a}.mileage.lte"), F.lit("0")).alias("mileage_max"),
            F.col(f"{a}.transmission_name").alias("transmission"),
            F.col(f"{a}.fueltype").alias("fuel_type"),
            F.col(f"{a}.car_type").alias("car_type"),
        ]
    cols += [
        F.col(f"{a}.region_name").alias("location"),
        F.col(f"{a}.name").alias("seller_name"),
        F.to_timestamp(F.col(f"{a}.date")).alias("listing_date"),
        F.coalesce(F.col(f"{a}.image_count"), F.lit(0)).alias("image_count"),
        F.col(f"{a}.adview_url").alias("ad_url"),
        F.col(f"{a}.region_id").alias("region_id"),
    ]
    return raw.select(*cols)


def clean_listings(
    df: DataFrame,
    *,
    as_of_year: int,
    price_lo: float = 0.0,
    price_hi: float = 1_000_000.0,
) -> DataFrame:
    """Analytics-ready frame: the reference's scan predicate + derived
    columns (data_loader.py:19-30, 58-66).

    - price ∈ (lo, hi) and year ~ ^[0-9]{4}$ (pushed to the scan);
    - year/mileage try-cast (null on junk, like pd.to_numeric coerce);
    - age = as_of_year − year (explicit as_of, not wall clock);
    - mileage_avg = (min+max)/2 (null-propagating).
    """
    return (
        df.where(
            (F.col("price") > F.lit(price_lo))
            & (F.col("price") < F.lit(price_hi))
            & F.col("year").rlike(YEAR_RE)
        )
        .withColumn("year_i", F.col("year").try_cast("int"))
        .withColumn("mileage_min_d", F.col("mileage_min").try_cast("double"))
        .withColumn("mileage_max_d", F.col("mileage_max").try_cast("double"))
        .withColumn("age", F.lit(as_of_year) - F.col("year_i"))
        .withColumn(
            "mileage_avg", (F.col("mileage_min_d") + F.col("mileage_max_d")) / 2
        )
    )
