"""ML smoke query: exercises the full pyspark.ml training path
(StringIndexer alphabetAsc parity → VectorAssembler → RandomForest →
R² evaluation, SURVEY.md §2.7 M1-M4) from the driver's registry.

No SQL oracle — tree ensembles are not SQL-expressible; the driver
records a rows-only check (1 row) and the statistical pins live in
tests/test_ml.py. The training set is a deterministic slice of the
``part`` table (predict p_retailprice from brand/container/size), so
the run is reproducible at any sf.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_mudah_spark.ml.price_model import train_price_model
from etl_mudah_spark.plans.registry import register
from etl_mudah_spark.tables import load


@register(
    "price_model_r2",
    oracle=None,
    doc="RF regression smoke: train on part, emit (r2_train, r2_test, n_rows).",
)
def price_model_r2(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part").select(
        "p_brand", "p_type", "p_size", "p_retailprice"
    )
    pm = train_price_model(
        part,
        label_col="p_retailprice",
        categorical_cols=["p_brand", "p_type"],
        numeric_cols=["p_size"],
        num_trees=20,
        seed=42,
    )
    n = part.count()
    return spark.createDataFrame(
        [(round(pm.r2_train, 4), round(pm.r2_test, 4), n)],
        "r2_train double, r2_test double, n_rows bigint",
    )
