"""ML price-model surface (M1-M7). Parity is statistical: R² in a sane
band and deterministic behavior across retrains with the same seed."""

from __future__ import annotations

import random

import pytest

from etl_mudah_spark.ml.price_model import (
    MIN_TRAINING_ROWS,
    similar_listings,
    train_price_model,
)
from tests.conftest import SF_SMOKE

MAKES = {"Perodua": 30_000, "Proton": 40_000, "Toyota": 90_000, "Honda": 80_000}


def _synthetic_listings(n=400, seed=42):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        make = rng.choice(list(MAKES))
        model = f"M{rng.randrange(3)}"
        age = rng.randrange(0, 15)
        mileage = rng.uniform(0, 200_000)
        base = MAKES[make] * (0.92 ** age) * (1 - mileage / 1_000_000)
        price = base * rng.uniform(0.95, 1.05)
        rows.append(
            (i, make, model, "Auto" if i % 2 else "Manual",
             "petrol", 2024 - age, age, mileage, round(price, 2))
        )
    return rows


SCHEMA = (
    "listing_id long, make string, model string, transmission string, "
    "fuel_type string, year_i int, age int, mileage_avg double, price double"
)


@pytest.fixture(scope="module")
def listings(spark):
    return spark.createDataFrame(_synthetic_listings(), SCHEMA)


@pytest.fixture(scope="module")
def trained(listings):
    return train_price_model(listings)


def test_r2_reasonable(trained):
    assert trained.r2_train > 0.8
    assert trained.r2_test > 0.6


def test_same_seed_same_model(listings, trained):
    again = train_price_model(listings)
    assert again.r2_train == trained.r2_train
    assert again.feature_importances() == trained.feature_importances()


def test_importances_sum_to_one(trained):
    imps = trained.feature_importances()
    assert abs(sum(v for _, v in imps) - 1.0) < 1e-6
    # age and make should dominate a depreciation-driven price
    top2 = {name for name, _ in imps[:3]}
    assert "age" in top2 or "make_idx" in top2


def test_point_prediction_with_interval(spark, trained):
    row = {"make": "Toyota", "model": "M1", "transmission": "Auto",
           "fuel_type": "petrol", "age": 5, "mileage_avg": 60_000.0}
    pred, lo, hi = trained.predict_one(spark, row)
    assert 10_000 < pred < 120_000
    assert lo == pytest.approx(pred * 0.85) and hi == pytest.approx(pred * 1.15)


def test_min_rows_guard(spark):
    tiny = spark.createDataFrame(_synthetic_listings(MIN_TRAINING_ROWS - 1), SCHEMA)
    with pytest.raises(ValueError, match="training rows"):
        train_price_model(tiny)


def test_similar_listings_lookup(listings):
    base = listings.first()
    out = similar_listings(
        listings,
        make=base.make,
        model=base.model,
        year=base.year_i,
        mileage_avg=base.mileage_avg,
    ).collect()
    assert 0 < len(out) <= 5
    for r in out:
        assert r.make == base.make and r.model == base.model
        assert abs(r.year_i - base.year_i) <= 2
        assert abs(r.mileage_avg - base.mileage_avg) <= 20_000


def test_model_save_load_roundtrip(spark, trained, tmp_path):
    """Persistence (SURVEY §3.3): a reloaded model must reproduce the
    original's predictions and metadata exactly — pyspark.ml native
    writers, so the same path works on HDFS/S3, unlike a joblib pickle
    on the driver's disk."""
    from etl_mudah_spark.ml.price_model import PriceModel

    path = str(tmp_path / "price_model")
    trained.save(path)
    reloaded = PriceModel.load(spark, path)

    assert reloaded.feature_cols == trained.feature_cols
    assert reloaded.r2_test == trained.r2_test
    probe = {
        "make": "Toyota", "model": "M1", "transmission": "Auto",
        "fuel_type": "petrol", "age": 5, "mileage_avg": 60_000.0,
    }
    assert reloaded.predict_one(spark, probe) == trained.predict_one(spark, probe)
    assert reloaded.feature_importances() == trained.feature_importances()


def test_doc_quality_model_auc_floor(spark):
    """The repetition classifier must beat chance comfortably — the
    quality features genuinely carry signal about 3-gram repetition."""
    from etl_mudah_spark.plans.registry import REGISTRY

    row = REGISTRY["doc_quality_model"].spark_fn(spark, SF_SMOKE).first()
    assert row["n_rows"] > 0
    assert 0 < row["n_positive"] < row["n_rows"]
    assert row["auc_ok"], "AUC below the QUALITY_AUC_FLOOR band"
