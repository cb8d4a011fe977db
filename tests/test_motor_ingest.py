"""Motorcycle ingest variant (dags/motor_dag.py): the same DataSource →
flatten → merge pipeline with the motor field mapping — motorcycle_*
make/model names, no mileage struct, no transmission/fuel/car_type."""

from __future__ import annotations

import json

import pytest

from etl_mudah_spark.operators.flatten import flatten_listings
from etl_mudah_spark.operators.merge import merge_upsert
from etl_mudah_spark.schemas import MOTORCYCLE_LISTINGS
from etl_mudah_spark.sources.fixtures import ROWS_PER_REGION
from etl_mudah_spark.sources.rest import ListingsDataSource

MOTOR_FETCHER = "etl_mudah_spark.sources.fixtures:motor_fixture_fetcher_factory"


@pytest.fixture(scope="module")
def motor_raw(spark):
    spark.dataSource.register(ListingsDataSource)
    return (
        spark.read.format("mudah_listings")
        .option("fetcher", MOTOR_FETCHER)
        .option("vehicle_type", "motorcycle")
        .option("regions", json.dumps(["1", "2"]))
        .option("page_size", "20")
        .option("rate_delay_s", "0")
        .load()
    )


def test_motor_schema_has_no_car_fields(motor_raw):
    attr_names = [f.name for f in motor_raw.schema["attributes"].dataType.fields]
    assert "motorcycle_make_name" in attr_names
    assert "mileage" not in attr_names
    assert "transmission_name" not in attr_names
    assert motor_raw.count() == 2 * ROWS_PER_REGION


def test_motor_flatten_maps_fields(motor_raw):
    flat = flatten_listings(motor_raw, vehicle_type="motorcycle")
    business_cols = [
        f.name
        for f in MOTORCYCLE_LISTINGS.fields
        if f.name not in {"created_at", "updated_at"}
    ]
    assert flat.columns == business_cols
    makes = {r["make"] for r in flat.select("make").distinct().collect()}
    assert makes == {"Yamaha", "Honda", "Kawasaki", "Modenas"}


def test_motor_flatten_rejects_unknown_type(motor_raw):
    with pytest.raises(ValueError, match="vehicle_type"):
        flatten_listings(motor_raw, vehicle_type="boat")


def test_motor_end_to_end_merge(spark, motor_raw, tmp_path):
    """Full motor pipeline: source → flatten → merge-upsert, idempotent
    across a replay (the motor DAG's ON CONFLICT contract)."""
    table = str(tmp_path / "motorcycle_listings")
    flat = flatten_listings(motor_raw, vehicle_type="motorcycle")
    n_keys = flat.select("listing_id").distinct().count()

    merge_upsert(
        spark, flat, table,
        key_cols=["listing_id"], order_cols=["listing_date", "listing_id"],
    )
    # materialize before the replay overwrites the files underneath
    first_ids = {r["listing_id"] for r in spark.read.parquet(table).collect()}
    assert len(first_ids) == n_keys  # cross-region dups collapsed

    # replay the same batch: no growth, same survivors
    merge_upsert(
        spark, flat, table,
        key_cols=["listing_id"], order_cols=["listing_date", "listing_id"],
    )
    again_ids = {r["listing_id"] for r in spark.read.parquet(table).collect()}
    assert again_ids == first_ids


def test_car_pipeline_unchanged(spark):
    """The default (car) mapping still produces the car columns."""
    spark.dataSource.register(ListingsDataSource)
    raw = (
        spark.read.format("mudah_listings")
        .option("fetcher", "etl_mudah_spark.sources.fixtures:fixture_fetcher_factory")
        .option("regions", json.dumps(["1"]))
        .option("page_size", "20")
        .option("rate_delay_s", "0")
        .load()
    )
    flat = flatten_listings(raw)
    assert "mileage_min" in flat.columns and "car_type" in flat.columns
