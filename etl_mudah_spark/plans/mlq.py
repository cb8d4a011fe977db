"""ML smoke queries: exercise the full pyspark.ml training path
(StringIndexer alphabetAsc parity → VectorAssembler → RandomForest /
LogisticRegression → metric evaluation, SURVEY.md §2.7 M1-M4) from the
driver's registry.

Tree ensembles are not SQL-expressible, so the driver-hashed rows are
invariant-shaped (round 5): exact input/label-set counts that DuckDB
reproduces, plus booleans asserting the seeded metrics land in fixed
bands. Statistical and determinism pins live in tests/test_ml.py. The
training sets are deterministic slices of the parquet tables, so every
run is reproducible at any sf.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_mudah_spark.ml.price_model import train_price_model
from etl_mudah_spark.plans.datapipe import EMB_DIM
from etl_mudah_spark.plans.registry import register
from etl_mudah_spark.tables import load


# R² sanity bands for the seeded RF smoke. The synthetic part table has
# NO learnable price signal (measured corr(features, label) ~ 0.003 at
# sf0.01), so the honest bands are "train fit is nonnegative-ish and
# bounded" / "test fit is not absurdly negative" — they catch NaN
# metrics, evaluator breakage, and train/test leakage-style r2>1, not
# model quality (doc_quality_model carries the "pipeline learns real
# signal" gate, AUC 1.0 on its derivable label). Exact determinism of
# the seeded training is pinned in tests/test_ml.py.
R2_TRAIN_BAND = (-0.1, 1.0)
R2_TEST_BAND = (-1.0, 1.0)


@register(
    "price_model_r2",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           TRUE AS r2_train_ok,
           TRUE AS r2_test_ok
    FROM part
    """,
    doc=(
        "RF regression smoke: train on part (seeded), emit n_rows + "
        "R²-within-band invariant booleans."
    ),
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
    train_ok = R2_TRAIN_BAND[0] <= pm.r2_train <= R2_TRAIN_BAND[1]
    test_ok = R2_TEST_BAND[0] <= pm.r2_test <= R2_TEST_BAND[1]
    return spark.createDataFrame(
        [(n, bool(train_ok), bool(test_ok))],
        "n_rows bigint, r2_train_ok boolean, r2_test_ok boolean",
    )


# AUC floor for the quality classifier: the label is derived from the
# same document the features come from, so a working pipeline separates
# the extremes near-perfectly (measured AUC 1.0 at sf0.01 and sf0.001).
QUALITY_AUC_FLOOR = 0.8

@register(
    "doc_quality_model",
    oracle=r"""
    WITH q AS (
        SELECT doc_id,
               len(string_split_regex(trim(text), '\s+')) AS n_tokens,
               len(list_distinct(string_split_regex(trim(text), '\s+'))) AS n_types
        FROM documents
    ), f AS (
        SELECT doc_id, 1 - n_types * 1.0 / n_tokens AS dup_word FROM q
    ), b AS (
        SELECT quantile_cont(dup_word, 0.25) AS p25,
               quantile_cont(dup_word, 0.75) AS p75
        FROM f
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN dup_word >= p75 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_positive,
           TRUE AS auc_ok
    FROM f, b
    WHERE dup_word >= p75 OR dup_word <= p25
    """,
    doc=(
        "LogisticRegression smoke: classify high-repetition docs from "
        "quality features; emits label-set counts (exact twin) + an "
        "AUC-floor invariant boolean."
    ),
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
    and LR is convex (no init sensitivity). The driver hashes the exact
    labeled-set counts vs a DuckDB percentile twin plus the AUC-floor
    boolean; the floor is also pinned in tests/test_ml.py."""
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
    # Driver-hashable invariant row: the labeled-set counts are exact
    # (DuckDB recomputes them from the same percentile thresholds); the
    # AUC itself is engine-specific, so it rides as a floor boolean.
    return spark.createDataFrame(
        [(n, int(pos), bool(float(auc) >= QUALITY_AUC_FLOOR))],
        "n_rows bigint, n_positive bigint, auc_ok boolean",
    )


@register(
    "brand_price_regression",
    oracle="""
    SELECT p_brand,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           ROUND(regr_slope(p_retailprice, p_size), 6) AS slope,
           ROUND(regr_intercept(p_retailprice, p_size), 6) AS intercept,
           ROUND(regr_r2(p_retailprice, p_size), 6) AS r2
    FROM part GROUP BY p_brand
    """,
    doc=(
        "Per-brand OLS of retail price on size via built-in regr_* "
        "aggregates (closed-form, one shuffle)."
    ),
)
def brand_price_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped closed-form regression — the statistical sibling of the
    RF pipeline: per-brand slope/intercept/R² of price vs size from the
    regr_* aggregate family (Spark 3.5+ / DuckDB both implement the
    standard Welford-style moments). One hash-partitioned aggregation,
    all JVM-side — the pattern for thousands of tiny per-group models
    where pyspark.ml per-group training (a job per model) would be
    absurd. Rounded to 6 dp on both engines: the moment sums are double
    accumulations whose association order differs per engine."""
    from pyspark.sql import functions as F

    part = load(spark, sf_dir, "part")
    y, x = F.col("p_retailprice"), F.col("p_size").cast("double")
    return part.groupBy("p_brand").agg(
        F.count("*").alias("n_parts"),
        F.round(F.regr_slope(y, x), 6).alias("slope"),
        F.round(F.regr_intercept(y, x), 6).alias("intercept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
    )


@register(
    "emb_pca_variance",
    oracle=f"""
    WITH dims AS (SELECT unnest(range(1, {EMB_DIM + 1})) AS i),
    per_dim AS (
        SELECT var_samp(embedding[dims.i]::DOUBLE) AS v
        FROM embeddings, dims
        GROUP BY dims.i
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM embeddings) AS n_vecs,
           ROUND(SUM(v), 3) AS total_var,
           TRUE AS evr_monotone,
           TRUE AS evr_sum_ok,
           TRUE AS pc1_var_ok
    FROM per_dim
    """,
    doc=(
        "Distributed PCA over the embedding corpus: exact total "
        "variance (DuckDB twin) + eigenstructure invariant booleans."
    ),
)
def emb_pca_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA over the embedding column via pyspark.ml.feature.PCA — the
    dimensionality-reduction stage of an embedding pipeline (whitening,
    compression before ANN indexing), run as one distributed JVM
    covariance + local eigensolve; no vectors ever reach the driver.

    Driver-hashable invariant row (the exact-twin pattern of
    events_user_hll): ``n_vecs``/``total_var`` are exact and DuckDB
    recomputes them (per-dimension sample variances summed — the trace
    of the covariance matrix); the eigenstructure itself is not
    SQL-expressible, so it rides as booleans the Spark side only emits
    TRUE when they actually hold: explained-variance ratios sorted
    descending, their sum in (0, 1], and — tying the eigensolve to the
    distributed transform — the sample variance of the first projected
    component equal to evr[0] * total_var within 1%.
    """
    from pyspark.ml.feature import PCA
    from pyspark.ml.functions import array_to_vector, vector_to_array
    from pyspark.sql import functions as F

    K = 8
    emb = load(spark, sf_dir, "embeddings")
    vecs = emb.select(
        array_to_vector(F.transform("embedding", lambda x: x.cast("double"))).alias(
            "features"
        )
    )
    model = PCA(k=K, inputCol="features", outputCol="pc").fit(vecs)
    evr = [float(x) for x in model.explainedVariance]

    # Exact twin: trace of the covariance matrix = sum of per-dimension
    # sample variances. posexplode -> (dim, value) -> 64-group agg; one
    # narrow shuffle regardless of corpus size.
    stats = (
        emb.select(F.posexplode("embedding").alias("i", "x"))
        .groupBy("i")
        .agg(F.var_samp(F.col("x").cast("double")).alias("v"))
        .agg(F.sum("v").alias("total_var"))
        .first()
    )
    total_var = float(stats["total_var"])
    n_vecs = emb.count()

    # Distributed cross-check: var(first projected component) must be
    # evr[0] * total_var (PCA maximizes exactly that variance).
    pc1_var = float(
        model.transform(vecs)
        .select(vector_to_array("pc")[0].alias("pc1"))
        .agg(F.var_samp("pc1"))
        .first()[0]
    )
    monotone = all(a >= b - 1e-12 for a, b in zip(evr, evr[1:]))
    sum_ok = 0.0 < sum(evr) <= 1.0 + 1e-9
    pc1_ok = abs(pc1_var - evr[0] * total_var) <= 0.01 * total_var
    return spark.createDataFrame(
        [(n_vecs, round(total_var, 3), bool(monotone), bool(sum_ok), bool(pc1_ok))],
        "n_vecs bigint, total_var double, evr_monotone boolean, "
        "evr_sum_ok boolean, pc1_var_ok boolean",
    )


@register(
    "part_brand_target_encoding",
    oracle="""
    WITH rows_f AS (
        SELECT p_brand, CAST(p_partkey % 5 AS INT) AS fold,
               p_retailprice AS y
        FROM part
    ), per AS (
        SELECT p_brand, fold,
               SUM(CAST(y AS DECIMAL(18,6))) AS fs,
               COUNT(*) AS fn
        FROM rows_f GROUP BY 1, 2
    ), tot AS (
        SELECT p_brand, SUM(fs) AS ts, SUM(fn) AS tn FROM per GROUP BY 1
    ), grand AS (
        SELECT CAST(SUM(ts) AS DOUBLE) / SUM(tn) AS mu FROM tot
    )
    SELECT per.p_brand, per.fold, CAST(per.fn AS BIGINT) AS n_fold,
           (CAST(tot.ts - per.fs AS DOUBLE) + 20.0 * grand.mu)
               / (tot.tn - per.fn + 20.0) AS encoding
    FROM per JOIN tot USING (p_brand) CROSS JOIN grand
    ORDER BY per.p_brand, per.fold
    """,
    doc=(
        "Leakage-safe 5-fold out-of-fold target encoding of p_brand by "
        "p_retailprice (m=20 smoothing toward the global prior); "
        "decimal-exact numerators, keymod folds."
    ),
)
def part_brand_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The categorical-feature encoder table (ml/features.py
    target_encode_oof): each (brand, fold) cell's encoding uses only
    the OTHER folds' target sums — the standard leakage-safe mean
    encoding — shrunk toward the global mean with m=20. Folds are
    p_partkey % 5 (pure key function, no RNG). One (cat, fold) shuffle
    with map-side partials; the encoder table is 125 rows and
    broadcasts back onto training rows via attach_target_encoding —
    the fact side never shuffles. Decimal-lattice sums and exact
    decimal subtraction make the out-of-fold numerator independent of
    aggregation order, so both engines land identical doubles."""
    from etl_mudah_spark.ml.features import fold_assign, target_encode_oof

    part = load(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_retailprice"
    )
    enc = target_encode_oof(
        part.withColumn("fold", fold_assign("p_partkey", 5)),
        cat_col="p_brand",
        target_col="p_retailprice",
        fold_col="fold",
        smoothing=20.0,
    )
    return enc.orderBy("p_brand", "fold")


@register(
    "part_brand_type_mi",
    oracle="""
    WITH joint AS (
        SELECT p_brand AS x, p_type AS y, COUNT(*) AS nxy FROM part
        GROUP BY 1, 2
    ), mx AS (
        SELECT x, SUM(nxy) AS nx FROM joint GROUP BY 1
    ), my AS (
        SELECT y, SUM(nxy) AS ny FROM joint GROUP BY 1
    ), tot AS (
        SELECT SUM(nxy) AS n FROM joint
    ), terms AS (
        SELECT (nxy * 1.0 / n) * ln((nxy * n) * 1.0 / (nx * ny)) AS mi_t
        FROM joint JOIN mx USING (x) JOIN my USING (y) CROSS JOIN tot
    ), hx AS (
        SELECT CAST(SUM(CAST(-(nx * 1.0 / n) * ln(nx * 1.0 / n)
                             AS DECIMAL(18,6))) AS DOUBLE) AS h
        FROM mx CROSS JOIN tot
    ), hy AS (
        SELECT CAST(SUM(CAST(-(ny * 1.0 / n) * ln(ny * 1.0 / n)
                             AS DECIMAL(18,6))) AS DOUBLE) AS h
        FROM my CROSS JOIN tot
    ), mi AS (
        SELECT CAST(SUM(CAST(mi_t AS DECIMAL(18,6))) AS DOUBLE) AS mi
        FROM terms
    )
    SELECT mi.mi AS mi_nats, hx.h AS h_brand, hy.h AS h_type,
           mi.mi / LEAST(hx.h, hy.h) AS nmi
    FROM mi, hx, hy
    """,
    doc=(
        "Mutual information between p_brand and p_type (nats), the "
        "marginal entropies, and min-normalized MI — the "
        "feature-relevance screen before encoding categoricals."
    ),
)
def part_brand_type_mi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical feature-relevance: I(brand; type) = Σ p(x,y)·
    ln(p(x,y)/(p(x)p(y))) with the marginal entropies and NMI =
    I/min(H) — the screen that decides which categoricals deserve a
    target encoding (ml/features.py). One (x, y) count shuffle; the
    marginals re-aggregate the |X×Y|-cell joint (1,000 cells here, tiny
    at any sf since the DOMAINS are bounded); every log term is
    count-ratio arithmetic (exact bigints in, identical doubles out)
    and the sums ride the decimal lattice, so both engines agree
    double for double."""
    part = load(spark, sf_dir, "part")
    from pyspark.sql import functions as F

    joint = part.groupBy(
        F.col("p_brand").alias("x"), F.col("p_type").alias("y")
    ).agg(F.count("*").alias("nxy"))
    mx = joint.groupBy("x").agg(F.sum("nxy").alias("nx"))
    my = joint.groupBy("y").agg(F.sum("nxy").alias("ny"))
    tot = joint.agg(F.sum("nxy").alias("n"))
    dsum6 = lambda c: F.sum(c.cast("decimal(18,6)")).cast("double")  # noqa: E731
    mi_term = (F.col("nxy") * 1.0 / F.col("n")) * F.log(
        (F.col("nxy") * F.col("n")) * 1.0 / (F.col("nx") * F.col("ny"))
    )
    mi = (
        joint.join(mx, "x")
        .join(my, "y")
        .join(F.broadcast(tot))
        .agg(dsum6(mi_term).alias("mi_nats"))
    )
    hx = mx.join(F.broadcast(tot)).agg(
        dsum6(
            -(F.col("nx") * 1.0 / F.col("n"))
            * F.log(F.col("nx") * 1.0 / F.col("n"))
        ).alias("h_brand")
    )
    hy = my.join(F.broadcast(tot)).agg(
        dsum6(
            -(F.col("ny") * 1.0 / F.col("n"))
            * F.log(F.col("ny") * 1.0 / F.col("n"))
        ).alias("h_type")
    )
    return (
        mi.join(F.broadcast(hx))
        .join(F.broadcast(hy))
        .select(
            "mi_nats",
            "h_brand",
            "h_type",
            (F.col("mi_nats") / F.least(F.col("h_brand"), F.col("h_type"))).alias(
                "nmi"
            ),
        )
    )


@register(
    "doc_quality_auc",
    oracle=r"""
    WITH f AS (
        SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
               len(list_filter(string_split_regex(trim(text), '\s+'),
                   x -> list_contains(['the','a','of','and','to','in','is','it'],
                                      lower(x)))) * 1.0
                   / len(string_split_regex(trim(text), '\s+')) AS s
        FROM documents
    ), g AS (
        SELECT s, SUM(y) AS pos, SUM(1 - y) AS neg FROM f GROUP BY s
    ), c AS (
        SELECT pos, neg,
               COALESCE(SUM(neg) OVER (ORDER BY s
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS below
        FROM g
    )
    SELECT CAST(SUM(pos) AS BIGINT) AS n_pos,
           CAST(SUM(neg) AS BIGINT) AS n_neg,
           CAST(SUM(pos * (2 * below + neg)) AS BIGINT) AS num_pairs2,
           SUM(pos * (2 * below + neg))
               / (2.0 * SUM(pos) * SUM(neg)) AS auc
    FROM c
    """,
    doc=(
        "Exact ROC-AUC (Mann-Whitney, ties = half) of the English "
        "stopword-ratio score against the lang='en' label — the "
        "quality-filter evaluation gate, bit-identical across engines."
    ),
)
def doc_quality_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How well does a 1-feature heuristic (English stopword ratio)
    identify English documents? Exact distributed AUC via
    ml/metrics.binary_auc_exact: group docs by score (one hash
    aggregation with map-side partials — the corpus reduces to
    |distinct scores| rows), two-phase bucketed prefix-sum of
    negatives (no single-task window over data), then one bigint
    reduction 2U = Σ pos_g·(2·neg_below + neg_g). num_pairs2 is hashed
    as an exact integer; auc is the one final division, so both
    engines land the identical double. The score itself is an int/int
    ratio (stop_hits/n_tokens) — deterministic without rounding."""
    from pyspark.sql import functions as F

    from etl_mudah_spark.ml.metrics import binary_auc_exact
    from etl_mudah_spark.operators import text as tx

    docs = load(spark, sf_dir, "documents").select("lang", "text")
    w = tx.words("text")
    en = F.array([F.lit(s) for s in tx.STOPWORDS["en"]])
    stop_hits = F.size(F.filter(w, lambda x: F.array_contains(en, F.lower(x))))
    scored = docs.select(
        (F.col("lang") == "en").cast("int").alias("y"),
        (stop_hits / F.size(w)).alias("s"),
    )
    return binary_auc_exact(scored, label_col="y", score_col="s")


@register(
    "doc_quality_calibration",
    oracle=r"""
    WITH f AS (
        SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
               len(list_filter(string_split_regex(trim(text), '\s+'),
                   x -> list_contains(['the','a','of','and','to','in','is','it'],
                                      lower(x)))) * 1.0
                   / len(string_split_regex(trim(text), '\s+')) AS s
        FROM documents
    )
    SELECT greatest(0, least(9, CAST(floor(s * 10) AS INT))) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(s AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
               AS mean_score,
           SUM(y) * 1.0 / COUNT(*) AS pos_rate,
           abs(SUM(y) * 1.0 / COUNT(*)
               - CAST(SUM(CAST(s AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*))
               AS abs_gap
    FROM f
    GROUP BY 1 ORDER BY 1
    """,
    doc=(
        "Reliability table for the stopword-ratio English classifier: "
        "10 fixed score bins, observed positive rate vs mean score, "
        "per-bin calibration gap (the ECE summands)."
    ),
)
def doc_quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The companion diagnostic to doc_quality_auc: AUC measures
    RANKING, this measures whether the score's MAGNITUDE means what it
    says (a 0.3-scoring bin should be ~30% English if the score is a
    calibrated probability). Fixed-width bins — no data-dependent
    edges — so the corpus reduces to ≤10 rows in one
    map-side-combined aggregation; mean scores ride the decimal
    lattice, the rates are exact count ratios. Weight abs_gap by n/N
    downstream for scalar ECE."""
    from pyspark.sql import functions as F

    from etl_mudah_spark.operators import text as tx

    docs = load(spark, sf_dir, "documents").select("lang", "text")
    w = tx.words("text")
    en = F.array([F.lit(s) for s in tx.STOPWORDS["en"]])
    stop_hits = F.size(F.filter(w, lambda x: F.array_contains(en, F.lower(x))))
    f = docs.select(
        (F.col("lang") == "en").cast("int").alias("y"),
        (stop_hits / F.size(w)).alias("s"),
    )
    bin_ = F.greatest(
        F.lit(0), F.least(F.lit(9), F.floor(F.col("s") * 10).cast("int"))
    )
    mean_score = F.sum(F.col("s").cast("decimal(18,6)")).cast(
        "double"
    ) / F.count("*")
    pos_rate = F.sum("y") * 1.0 / F.count("*")
    return (
        f.groupBy(bin_.alias("bin"))
        .agg(
            F.count("*").cast("bigint").alias("n"),
            mean_score.alias("mean_score"),
            pos_rate.alias("pos_rate"),
            F.abs(pos_rate - mean_score).alias("abs_gap"),
        )
        .orderBy("bin")
    )


_EN_SCORE_CTE = r"""
    WITH f AS (
        SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
               len(list_filter(string_split_regex(trim(text), '\s+'),
                   x -> list_contains(['the','a','of','and','to','in','is','it'],
                                      lower(x)))) * 1.0
                   / len(string_split_regex(trim(text), '\s+')) AS s
        FROM documents
    )"""


def _en_quality_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(y, s) — the lang='en' label and the English stopword-ratio
    score, shared by the AUC / calibration / PR / Brier evaluation
    queries. The score is an int/int ratio (stop_hits / n_tokens):
    deterministic doubles with no rounding step."""
    from pyspark.sql import functions as F

    from etl_mudah_spark.operators import text as tx

    docs = load(spark, sf_dir, "documents").select("lang", "text")
    w = tx.words("text")
    en = F.array([F.lit(s) for s in tx.STOPWORDS["en"]])
    stop_hits = F.size(F.filter(w, lambda x: F.array_contains(en, F.lower(x))))
    return docs.select(
        (F.col("lang") == "en").cast("int").alias("y"),
        (stop_hits / F.size(w)).alias("s"),
    )


@register(
    "doc_quality_pr_curve",
    oracle=_EN_SCORE_CTE
    + r""", g AS (
        SELECT s, SUM(y) AS pos, SUM(1 - y) AS neg FROM f GROUP BY s
    ), c AS (
        SELECT s, pos, neg,
               SUM(pos) OVER (ORDER BY s DESC) AS cum_pos,
               SUM(neg) OVER (ORDER BY s DESC) AS cum_neg
        FROM g
    ), t AS (
        SELECT SUM(pos) AS np FROM g
    )
    SELECT s AS score, CAST(pos AS BIGINT) AS pos,
           CAST(neg AS BIGINT) AS neg,
           CAST(cum_pos AS BIGINT) AS cum_pos,
           CAST(cum_neg AS BIGINT) AS cum_neg,
           cum_pos * 1.0 / (cum_pos + cum_neg) AS prec,
           cum_pos * 1.0 / t.np AS rec
    FROM c CROSS JOIN t ORDER BY score DESC
    """,
    doc=(
        "Exact precision-recall curve of the stopword-ratio English "
        "classifier: one row per distinct score threshold "
        "(descending), cumulative tp/fp, precision and recall — each "
        "a single division of exact bigints."
    ),
)
def doc_quality_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rare-positive evaluation lens (ml/metrics.pr_curve_exact):
    ROC-AUC is blind to prevalence, so a corpus filter gating on it
    alone can ship garbage precision; this emits the full exact PR
    curve at every distinct threshold. One score aggregation collapses
    the corpus, the two cumulative counts ride the two-phase bucketed
    prefix sum DESCENDING (bucket = −floor(s·64), order-aligned), and
    n_pos folds in as a 1-row broadcast — no global window, no
    collect, |distinct scores| output rows at any corpus size."""
    from pyspark.sql import functions as F

    from etl_mudah_spark.ml.metrics import pr_curve_exact

    scored = _en_quality_scored(spark, sf_dir)
    curve = pr_curve_exact(scored, label_col="y", score_col="s")
    return curve.select(
        "score",
        "pos",
        "neg",
        "cum_pos",
        "cum_neg",
        F.col("precision").alias("prec"),
        F.col("recall").alias("rec"),
    ).orderBy(F.desc("score"))


@register(
    "doc_quality_avg_precision",
    oracle=_EN_SCORE_CTE
    + r""", g AS (
        SELECT s, SUM(y) AS pos, SUM(1 - y) AS neg FROM f GROUP BY s
    ), c AS (
        SELECT pos,
               SUM(pos) OVER (ORDER BY s DESC) AS cum_pos,
               SUM(neg) OVER (ORDER BY s DESC) AS cum_neg
        FROM g
    ), t AS (
        SELECT SUM(pos) AS np, SUM(neg) AS nn FROM g
    )
    SELECT CAST(t.np AS BIGINT) AS n_pos, CAST(t.nn AS BIGINT) AS n_neg,
           CAST(SUM(CAST((pos * cum_pos) * 1.0 / (cum_pos + cum_neg)
                         AS DECIMAL(18,6))) AS DOUBLE) / t.np
               AS avg_precision
    FROM c CROSS JOIN t GROUP BY t.np, t.nn
    """,
    doc=(
        "Tie-blocked average precision (area under the step PR curve) "
        "of the stopword-ratio English classifier — exact bigint "
        "terms, decimal-lattice sum, one final division."
    ),
)
def doc_quality_avg_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PR curve reduced to its headline scalar
    (ml/metrics.average_precision_exact): AP = (1/n_pos)·Σ_g pos_g ·
    precision@g over distinct scores descending — sklearn's
    step-interpolation rule, where ties collapse into blocks exactly.
    Each term is a bigint product with ONE division; the sum rides
    the decimal(18,6) lattice so partition order cannot move the
    double. Same plan skeleton as the curve query: no global window,
    1-row totals broadcast, single final reduction."""
    from etl_mudah_spark.ml.metrics import average_precision_exact

    scored = _en_quality_scored(spark, sf_dir)
    return average_precision_exact(scored, label_col="y", score_col="s")


@register(
    "doc_quality_brier",
    oracle=_EN_SCORE_CTE
    + r""", g AS (
        SELECT s, COUNT(*) AS n_g, SUM(y) AS pos FROM f GROUP BY s
    ), t AS (
        SELECT SUM(n_g) AS n, SUM(pos) AS np FROM g
    )
    SELECT CAST(t.n AS BIGINT) AS n, CAST(t.np AS BIGINT) AS n_pos,
           CAST(SUM(CAST(n_g * s * s - 2 * s * pos + pos
                         AS DECIMAL(18,6))) AS DOUBLE) / t.n AS brier,
           (t.np * 1.0 / t.n) * (1 - t.np * 1.0 / t.n) AS uncertainty,
           CAST(SUM(CAST(n_g * (pos * 1.0 / n_g - t.np * 1.0 / t.n)
                             * (pos * 1.0 / n_g - t.np * 1.0 / t.n)
                         AS DECIMAL(18,6))) AS DOUBLE) / t.n AS resolution,
           CAST(SUM(CAST(n_g * (s - pos * 1.0 / n_g)
                             * (s - pos * 1.0 / n_g)
                         AS DECIMAL(18,6))) AS DOUBLE) / t.n AS reliability
    FROM g CROSS JOIN t GROUP BY t.n, t.np
    """,
    doc=(
        "Brier score of the stopword-ratio score as an English "
        "probability, with Murphy's uncertainty/resolution/"
        "reliability decomposition over the distinct forecast values."
    ),
)
def doc_quality_brier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUC measures ranking, calibration tables eyeball magnitude —
    the Brier decomposition (ml/metrics.brier_decomposition_exact)
    QUANTIFIES magnitude quality: uncertainty (irreducible base-rate
    variance) − resolution (how much the forecast separates outcomes)
    + reliability (miscalibration penalty). Forecast bins are the
    distinct score values, so the decomposition is exact (no binning
    choice); every term is count-ratio arithmetic on exact bigints
    summed on the decimal lattice. One score-group aggregation + a
    1-row base-rate broadcast; no window."""
    from etl_mudah_spark.ml.metrics import brier_decomposition_exact

    scored = _en_quality_scored(spark, sf_dir)
    return brier_decomposition_exact(scored, label_col="y", score_col="s")


@register(
    "events_type_quantile_norm",
    oracle="""
    WITH g AS (
        SELECT event_type AS ty, value AS v, COUNT(*) AS c
        FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ), cg AS (
        SELECT ty, v, c,
               SUM(c) OVER (PARTITION BY ty ORDER BY v) AS cum
        FROM g
    ), ng AS (
        SELECT ty, SUM(c) AS n_g FROM g GROUP BY ty
    ), t AS (
        SELECT SUM(c) AS n FROM g
    ), p AS (
        SELECT v, SUM(c) AS pc FROM g GROUP BY v
    ), cp AS (
        SELECT v, pc, SUM(pc) OVER (ORDER BY v) AS pcum FROM p
    ), tgt AS (
        SELECT cg.ty, cg.v, cg.c AS w,
               (cg.cum * t.n + ng.n_g - 1) // ng.n_g AS tr
        FROM cg JOIN ng USING (ty) CROSS JOIN t
    ), mapped AS (
        SELECT tgt.ty, tgt.v, tgt.w, cp.v AS mv
        FROM tgt JOIN cp
          ON tgt.tr BETWEEN cp.pcum - cp.pc + 1 AND cp.pcum
    )
    SELECT ty AS event_type,
           CAST(SUM(w) AS BIGINT) AS n,
           CAST(SUM(CAST(v * w AS DECIMAL(18,6))) AS DOUBLE) / SUM(w)
               AS mean_raw,
           CAST(SUM(CAST(mv * w AS DECIMAL(18,6))) AS DOUBLE) / SUM(w)
               AS mean_mapped,
           MIN(mv) AS min_mapped,
           MAX(mv) AS max_mapped
    FROM mapped GROUP BY ty ORDER BY event_type
    """,
    doc=(
        "Quantile normalization of event value per event type onto "
        "the pooled distribution: integer-rank lookup mapping, with "
        "the per-type raw-vs-mapped mean profile showing the "
        "distributions align."
    ),
)
def events_type_quantile_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature alignment before mixing heterogeneous sources
    (ml/features.quantile_normalize): each type's values are replaced
    by the pooled value at the same relative rank — after which every
    type draws from the SAME distribution (the profile shows raw
    means spread ~47-52 while mapped means agree to ~0.1). The rank
    arithmetic is all-integer (ceil via (cum·N + n_g − 1) div n_g),
    the lookup is a point-in-interval join over pooled rank ranges
    run as the binned equi-join (operators/intervals.py) — no
    non-equi shuffle, no window over data; the oracle replays the
    identical mapping with SQL windows and a BETWEEN join. Weighted
    means ride the decimal lattice."""
    from pyspark.sql import functions as F

    from etl_mudah_spark.ml.features import quantile_normalize

    ev = load(spark, sf_dir, "events").select("event_type", "value")
    m = quantile_normalize(ev, "event_type", "value")
    dsum6 = lambda c: F.sum(c.cast("decimal(18,6)")).cast("double")  # noqa: E731
    return (
        m.groupBy("event_type")
        .agg(
            F.sum("weight").cast("bigint").alias("n"),
            (
                dsum6(F.col("value") * F.col("weight")) / F.sum("weight")
            ).alias("mean_raw"),
            (
                dsum6(F.col("mapped") * F.col("weight")) / F.sum("weight")
            ).alias("mean_mapped"),
            F.min("mapped").alias("min_mapped"),
            F.max("mapped").alias("max_mapped"),
        )
        .orderBy("event_type")
    )
