"""Price-regression surface (SURVEY.md §2.7 M1-M7) on pyspark.ml.

Reference: streamlit/pages/price_prediction.py —
- M1 label encoding (:35-39): LabelEncoder per categorical →
  StringIndexer with stringOrderType='alphabetAsc' (LabelEncoder codes
  are lexicographic; Spark's default frequencyDesc would NOT match) and
  handleInvalid='keep' mirroring the unknown-category warning (:74-79);
- M2 split (:46): randomSplit(seed=42) — statistically equivalent to
  train_test_split, not row-identical (different RNG; SURVEY §7.4.5);
- M3 model (:49-51): RandomForestRegressor(numTrees=100, seed=42) with
  the n≥100 training-rows guard (:30-32);
- M4 scoring (:54-55): RegressionEvaluator(r2) on train and test;
- M5 point prediction (:67-92): transform of a one-row frame;
- M6 interval (:158-161): ±15% heuristic band;
- M7 importances (:203-207): featureImportances → sorted frame.

ML parity is statistical, not bitwise: sklearn and Spark grow different
trees; tests assert R² tolerance and importance rankings, not values.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.evaluation import RegressionEvaluator
from pyspark.ml.feature import StringIndexer, VectorAssembler
from pyspark.ml.regression import RandomForestRegressor
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MIN_TRAINING_ROWS = 100  # price_prediction.py:30


@dataclass
class PriceModel:
    model: PipelineModel
    feature_cols: list[str]
    categorical_cols: list[str]
    r2_train: float
    r2_test: float

    def predict_one(self, spark: SparkSession, row: dict) -> tuple[float, float, float]:
        """Point prediction + ±15% heuristic interval (M5/M6)."""
        df = spark.createDataFrame([row])
        pred = float(self.model.transform(df).select("prediction").first()[0])
        return pred, pred * 0.85, pred * 1.15

    def feature_importances(self) -> list[tuple[str, float]]:
        """(feature, importance) sorted descending (M7)."""
        rf = self.model.stages[-1]
        imps = rf.featureImportances.toArray().tolist()
        pairs = list(zip(self.feature_cols, imps))
        return sorted(pairs, key=lambda p: (-p[1], p[0]))

    def save(self, path: str) -> None:
        """Persist pipeline + metadata (the reference ships joblib for
        exactly this but never calls it, requirements.txt:2; SURVEY §3.3
        maps it to pyspark.ml's native writers — distributed-FS-safe,
        unlike a driver-local pickle)."""
        import json

        spark = SparkSession.getActiveSession()
        self.model.write().overwrite().save(f"{path}/pipeline")
        meta = json.dumps(
            {
                "feature_cols": self.feature_cols,
                "categorical_cols": self.categorical_cols,
                "r2_train": self.r2_train,
                "r2_test": self.r2_test,
            }
        )
        spark.createDataFrame([(meta,)], "meta string").coalesce(1).write.mode(
            "overwrite"
        ).text(f"{path}/meta")

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "PriceModel":
        import json

        meta = json.loads(spark.read.text(f"{path}/meta").first()[0])
        return cls(
            model=PipelineModel.load(f"{path}/pipeline"),
            feature_cols=meta["feature_cols"],
            categorical_cols=meta["categorical_cols"],
            r2_train=meta["r2_train"],
            r2_test=meta["r2_test"],
        )


def train_price_model(
    df: DataFrame,
    *,
    label_col: str = "price",
    categorical_cols: list[str] | None = None,
    numeric_cols: list[str] | None = None,
    num_trees: int = 100,
    seed: int = 42,
) -> PriceModel:
    """Train the RF price model with LabelEncoder-parity indexing."""
    categorical_cols = categorical_cols or ["make", "model", "transmission", "fuel_type"]
    numeric_cols = numeric_cols or ["age", "mileage_avg"]

    clean = df.na.drop(subset=categorical_cols + numeric_cols + [label_col])
    n = clean.count()
    if n < MIN_TRAINING_ROWS:
        raise ValueError(f"need ≥{MIN_TRAINING_ROWS} training rows, got {n}")

    indexers = [
        StringIndexer(
            inputCol=c,
            outputCol=f"{c}_idx",
            stringOrderType="alphabetAsc",  # LabelEncoder parity (M1)
            handleInvalid="keep",
        )
        for c in categorical_cols
    ]
    feature_cols = [f"{c}_idx" for c in categorical_cols] + numeric_cols
    assembler = VectorAssembler(inputCols=feature_cols, outputCol="features")
    rf = RandomForestRegressor(
        featuresCol="features",
        labelCol=label_col,
        numTrees=num_trees,
        seed=seed,
    )
    pipeline = Pipeline(stages=[*indexers, assembler, rf])

    train, test = clean.randomSplit([0.8, 0.2], seed=seed)
    model = pipeline.fit(train)
    evaluator = RegressionEvaluator(labelCol=label_col, metricName="r2")
    r2_train = evaluator.evaluate(model.transform(train))
    r2_test = evaluator.evaluate(model.transform(test))
    return PriceModel(
        model=model,
        feature_cols=feature_cols,
        categorical_cols=categorical_cols,
        r2_train=r2_train,
        r2_test=r2_test,
    )


def similar_listings(
    df: DataFrame,
    *,
    make: str,
    model: str,
    year: int,
    mileage_avg: float,
    year_window: int = 2,
    mileage_window: float = 20_000.0,
    limit: int = 5,
) -> DataFrame:
    """Similar-listings lookup (P10, price_prediction.py:165-185):
    equality on make/model, ±window on year and mileage, deterministic
    order + limit."""
    return (
        df.where(
            (F.col("make") == make)
            & (F.col("model") == model)
            & F.col("year_i").between(year - year_window, year + year_window)
            & F.col("mileage_avg").between(
                mileage_avg - mileage_window, mileage_avg + mileage_window
            )
        )
        .orderBy(F.asc("price"), F.asc("listing_id"))
        .limit(limit)
    )
