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


@register(
    "doc_quality_model",
    oracle=None,
    doc="LogisticRegression smoke: classify high-repetition docs from quality features.",
)
def doc_quality_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classification twin of price_model_r2: predict whether a doc's
    duplicate-WORD fraction (1 - type/token ratio, the Gopher
    repetition signal that is continuous for every doc) is high, from
    the OTHER quality signals (token count, token length, punctuation/
    digit/stopword ratios; type_token_ratio itself is excluded — it IS
    the label's complement) — the quality-classifier stage of a
    pretraining filter, on pyspark.ml's LogisticRegression.

    Labels follow the standard classifier-filter recipe: train on
    CONFIDENT extremes only (repetition above p75 = positive, below
    p25 = negative, middle half dropped) — a median split would ask
    the model to separate docs that differ by noise. Deterministic:
    thresholds are exact percentiles, the split is randomSplit(seed=42),
    and LR is convex (no init sensitivity). Rows-only driver check
    (1 row); AUC sanity floor pinned in tests/test_ml.py."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.evaluation import BinaryClassificationEvaluator
    from pyspark.ml.feature import VectorAssembler
    from pyspark.sql import functions as F

    from etl_mudah_spark.operators import text as tx

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    feats = tx.quality_features(docs).select(
        "doc_id",
        (1 - F.col("type_token_ratio")).alias("dup_word"),
        "n_tokens",
        "avg_token_len",
        "punct_ratio",
        "digit_ratio",
        "stopword_ratio",
    )
    p25, p75 = feats.agg(
        F.percentile("dup_word", 0.25), F.percentile("dup_word", 0.75)
    ).first()
    labeled = feats.where(
        (F.col("dup_word") >= F.lit(float(p75)))
        | (F.col("dup_word") <= F.lit(float(p25)))
    ).withColumn("label", (F.col("dup_word") >= F.lit(float(p75))).cast("double"))
    fcols = ["n_tokens", "avg_token_len", "punct_ratio", "digit_ratio", "stopword_ratio"]
    assembled = VectorAssembler(inputCols=fcols, outputCol="features").transform(
        labeled
    )
    train, test = assembled.randomSplit([0.8, 0.2], seed=42)
    model = LogisticRegression(maxIter=20).fit(train)
    auc = BinaryClassificationEvaluator(metricName="areaUnderROC").evaluate(
        model.transform(test)
    )
    pos = labeled.agg(F.sum("label")).first()[0]
    n = labeled.count()
    return spark.createDataFrame(
        [(round(float(auc), 4), int(pos), n)],
        "auc_test double, n_positive bigint, n_rows bigint",
    )
