"""LLM training-data preparation queries over the documents/embeddings
tables — the operations a 100 TB pretraining pipeline runs between raw
crawl and tokenizer:

- ``doc_chunks``: overlapping word-window chunking (context-window
  packing). Pure array algebra: sequence → explode → slice; each row
  expands in place, the ONLY exchange is whatever the consumer adds.
  At 100 TB chunking is embarrassingly parallel map work — exactly
  what this plan is.
- ``vocab_topk``: corpus vocabulary with counts. explode + count is
  one shuffle with map-side partial aggregation; top-k via
  TakeOrdered, no global sort.
- ``term_idf_top20``: document frequency + inverse document frequency
  per term (the tf-idf prior). array_distinct BEFORE explode keeps
  the shuffle at one row per (doc, term), not per occurrence; the
  corpus size N folds in as a 1-row broadcast, not a driver scalar.
- ``emb_label_centroids``: per-label element-wise embedding mean
  (class centroids for probing/clustering). posexplode → single agg,
  all in codegen; output is long form (label, pos, centroid_val) —
  the distributed representation — with ``centroid_assemble`` as the
  presentation-layer array re-assembly.

- ``doc_train_split``: deterministic hash-bucket train/val/test
  assignment — a pure function of doc_id, not an RNG sample.
- ``doc_shard_pack``: greedy sequential packing into ~4096-token
  shards per source (running-sum window partitioned by source).
- ``doc_global_shuffle``: reproducible md5-order corpus shuffle into
  fixed-size shards; global position via md5-prefix bucketing, not a
  single-task window.

All seven have exact DuckDB oracle twins (tokenization contract shared
with plans/datapipe.py: whitespace split of trim(text)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_mudah_spark.operators import sampling as smp
from etl_mudah_spark.operators.ckpt import materialize_once as _materialize_once
from etl_mudah_spark.operators import text as tx
from etl_mudah_spark.operators.similarity import as_double
from etl_mudah_spark.plans.registry import register
from etl_mudah_spark.tables import load, table_num_rows

_WORDS_SQL = r"string_split_regex(trim(text), '\s+')"

CHUNK_SIZE = 32  # words per chunk
CHUNK_STRIDE = 24  # start-to-start distance => 8-word overlap


@register(
    "doc_chunks",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, {_WORDS_SQL} AS words FROM documents
    )
    SELECT doc_id,
           CAST(s / {CHUNK_STRIDE} AS INT) AS chunk_id,
           CAST(len(list_slice(words, s + 1, s + {CHUNK_SIZE})) AS INT) AS n_tokens,
           array_to_string(list_slice(words, s + 1, s + {CHUNK_SIZE}), ' ') AS chunk_text
    FROM w, UNNEST(range(0, len(words), {CHUNK_STRIDE})) AS t(s)
    """,
    doc=f"Overlapping word-window chunking ({CHUNK_SIZE} words, stride {CHUNK_STRIDE}).",
)
def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", tx.words("text").alias("words")
    )
    starts = F.sequence(
        F.lit(0), F.size("words") - 1, F.lit(CHUNK_STRIDE)
    )
    chunk = F.slice(F.col("words"), F.col("s") + 1, CHUNK_SIZE)
    return (
        docs.select("doc_id", "words", F.explode(starts).alias("s"))
        .select(
            "doc_id",
            (F.col("s") / CHUNK_STRIDE).cast("int").alias("chunk_id"),
            F.size(chunk).cast("int").alias("n_tokens"),
            F.array_join(chunk, " ").alias("chunk_text"),
        )
    )


@register(
    "vocab_topk",
    oracle=f"""
    SELECT lower(term) AS term, COUNT(*) AS cnt
    FROM (SELECT UNNEST({_WORDS_SQL}) AS term FROM documents)
    GROUP BY 1
    ORDER BY cnt DESC, term ASC
    LIMIT 50
    """,
    doc="Corpus vocabulary: top-50 terms by occurrence count.",
)
def vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tx.words("text")).alias("term"))
        .select(F.lower("term").alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("term"))
        .limit(50)
    )


@register(
    "term_idf_top20",
    oracle=f"""
    WITH per_doc AS (
        SELECT doc_id, UNNEST(list_distinct({_WORDS_SQL})) AS term FROM documents
    ), df AS (
        SELECT lower(term) AS term, COUNT(*) AS doc_freq
        FROM per_doc GROUP BY 1
    )
    SELECT term, doc_freq,
           ROUND(ln((SELECT COUNT(*) FROM documents) / doc_freq::DOUBLE), 6) AS idf
    FROM df
    ORDER BY doc_freq DESC, term ASC
    LIMIT 20
    """,
    doc="Per-term document frequency + idf, top-20 most common terms.",
)
def term_idf_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    n_docs = docs.agg(F.count("*").alias("_n"))
    # distinct per doc BEFORE exploding: the shuffle carries one row per
    # (doc, term) instead of one per occurrence.
    df_counts = (
        docs.select("doc_id", F.explode(F.array_distinct(tx.words("text"))).alias("term"))
        .select(F.lower("term").alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("doc_freq"))
    )
    return (
        df_counts.join(F.broadcast(n_docs))
        .select(
            "term",
            "doc_freq",
            F.round(F.log(F.col("_n") / F.col("doc_freq")), 6).alias("idf"),
        )
        .orderBy(F.desc("doc_freq"), F.asc("term"))
        .limit(20)
    )


BM25_K1 = 1.2
BM25_B = 0.75
BM25_QUERY = ("spark", "window", "merge")


@register(
    "doc_bm25_search",
    oracle=rf"""
    WITH tok AS (
        SELECT doc_id,
               len({_WORDS_SQL}) AS dl,
               lower(UNNEST({_WORDS_SQL})) AS term
        FROM documents
    ), tf AS (
        SELECT doc_id, term,
               COUNT(*)::DOUBLE AS tf, ANY_VALUE(dl)::DOUBLE AS dl
        FROM tok WHERE term IN ('spark', 'window', 'merge')
        GROUP BY doc_id, term
    ), dfreq AS (
        SELECT term, COUNT(*)::DOUBLE AS df FROM tf GROUP BY term
    ), stats AS (
        SELECT COUNT(*)::DOUBLE AS n,
               AVG(len({_WORDS_SQL}))::DOUBLE AS avgdl
        FROM documents
    )
    SELECT doc_id,
           ROUND(SUM(
               ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))
               * tf.tf * ({BM25_K1} + 1)
               / (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * tf.dl / s.avgdl))
           ), 6) AS bm25
    FROM tf JOIN dfreq d USING (term), stats s
    GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id ASC
    LIMIT 10
    """,
    doc=(
        "Lexical retrieval: top-10 docs by Okapi BM25 for the query "
        "terms (spark, window, merge)."
    ),
)
def doc_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 ranked retrieval — the lexical-search half of a
    data-curation stack (near-dup mining against eval queries, targeted
    corpus slicing) next to the embedding ANN family.

    Scale shape: tokens are filtered to the query terms BEFORE any
    shuffle (the explode feeds a literal IN-list, so the grouped
    relation is O(matching doc-terms), not O(corpus tokens)); document
    frequency and the (N, avgdl) corpus stats are tiny aggregates that
    broadcast back; one final per-doc sum + TakeOrdered(10). Everything
    is codegen expression math — no UDFs.
    """
    docs = load(spark, sf_dir, "documents")
    return (
        _bm25_scored(docs, BM25_QUERY)
        .select("doc_id", F.round("bm25", 6).alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(10)
    )


def _bm25_tf(docs: DataFrame, terms: tuple[str, ...]) -> DataFrame:
    """The (doc_id, term, tf, dl) table feeding BM25 — pre-boundary.

    Scale shape lives here: the query-term IN-filter sits directly on
    the exploded tokens, so the grouped relation is O(matching
    doc-terms), not O(corpus tokens). Kept as its own function so the
    plan-shape guard can assert that property (the materialize-once
    boundary in _bm25_scored hides this subtree behind an ExistingRDD
    in the final plan)."""
    toks = docs.select(
        "doc_id",
        # size(words) inline: the same select explodes the words array,
        # so codegen subexpression elimination computes the split once
        # and size() rides it free.
        F.size(tx.words("text")).cast("double").alias("dl"),
        F.explode(tx.words("text")).alias("term"),
    ).select("doc_id", "dl", F.lower("term").alias("term"))
    return (
        toks.where(F.col("term").isin(*terms))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("double").alias("tf"), F.max("dl").alias("dl"))
    )


def _bm25_scored(docs: DataFrame, terms: tuple[str, ...]) -> DataFrame:
    """Per-doc unrounded Okapi BM25 for ``terms`` — the scoring core
    shared by the ranked-retrieval query and the RRF hybrid fusion.
    Only docs containing at least one query term appear."""
    tf = _bm25_tf(docs, terms)
    # tf feeds two consumers (the df aggregate and the scoring join);
    # without a boundary each re-tokenizes the corpus. tf is tiny by
    # construction (only query-term matches), so the materialize-once
    # costs ~nothing and halves the query (x10: 0.455 -> 0.215 s warm
    # median, identical top-k — round 15).
    tf = _materialize_once(tf)
    dfreq = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    stats = docs.agg(
        F.count("*").cast("double").alias("n"),
        F.avg(tx.token_count("text")).alias("avgdl"),
    )
    idf = F.log(F.lit(1.0) + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    denom = F.col("tf") + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
    per_term = idf * F.col("tf") * (BM25_K1 + 1) / denom
    return (
        tf.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(per_term).alias("bm25"))
    )


@register(
    "emb_label_centroids",
    oracle="""
    WITH e AS (
        SELECT label, i AS pos, embedding[i + 1]::DOUBLE AS val
        FROM embeddings, UNNEST(range(len(embedding))) AS t(i)
    )
    SELECT label, CAST(pos AS INT) AS pos, ROUND(AVG(val), 6) AS centroid_val
    FROM e GROUP BY label, pos
    """,
    doc="Per-label element-wise embedding mean (class centroids), long form.",
)
def emb_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-form (label, pos, centroid_val) rather than array<double> rows:
    scalar columns survive any downstream canonicalizer/sort, and at scale
    the long form IS the distributed representation — re-assembly into one
    array per label is a presentation step (see ``centroid_assemble``)."""
    emb = load(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.posexplode(as_double(F.col("embedding"))).alias("pos", "val"))
        .groupBy("label", "pos")
        .agg(F.round(F.avg("val"), 6).alias("centroid_val"))
        .select("label", F.col("pos").cast("int").alias("pos"), "centroid_val")
    )


@register(
    "emb_label_separation",
    oracle="""
    WITH cent AS (
        SELECT label, i AS pos, ROUND(AVG(embedding[i + 1]::DOUBLE), 6) AS cv
        FROM embeddings, UNNEST(range(len(embedding))) AS t(i)
        GROUP BY label, i
    ), mem AS (
        SELECT e.vec_id, e.label,
               SUM(e.embedding[c.pos + 1]::DOUBLE * c.cv) AS dot,
               SUM(e.embedding[c.pos + 1]::DOUBLE
                   * e.embedding[c.pos + 1]::DOUBLE) AS nx,
               SUM(c.cv * c.cv) AS nc
        FROM embeddings e JOIN cent c ON c.label = e.label
        GROUP BY e.vec_id, e.label
    ), coh AS (
        SELECT label, ROUND(AVG(dot / (SQRT(nx) * SQRT(nc))), 4) AS cohesion
        FROM mem GROUP BY label
    ), cc AS (
        SELECT a.label AS la, b.label AS lb,
               SUM(a.cv * b.cv) AS dot,
               SUM(a.cv * a.cv) AS na,
               SUM(b.cv * b.cv) AS nb
        FROM cent a JOIN cent b ON a.pos = b.pos AND a.label <> b.label
        GROUP BY a.label, b.label
    ), sep AS (
        SELECT la AS label,
               ROUND(MAX(dot / (SQRT(na) * SQRT(nb))), 4) AS separation
        FROM cc GROUP BY la
    )
    SELECT c.label, c.cohesion, s.separation,
           ROUND(c.cohesion - s.separation, 4) AS margin
    FROM coh c JOIN sep s USING (label) ORDER BY c.label
    """,
    doc=(
        "Per-label embedding cohesion (mean member-to-centroid cosine) "
        "vs separation (max inter-centroid cosine) and their margin."
    ),
)
def emb_label_separation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is the label structure real in embedding space? Per label:
    cohesion = mean cosine of members to their own centroid,
    separation = max cosine of the centroid to any OTHER centroid,
    margin = cohesion - separation. A near-zero or negative margin
    flags labels the embedding cannot distinguish — the aggregate-level
    companion to emb_knn_label_agreement's instance-level vote.

    Scale: centroids are a bounded (labels x dim) aggregate; members
    score against their label's ASSEMBLED centroid via a broadcast
    join + in-row zip_with fold (map-side, no corpus x dim shuffle);
    the centroid-centroid matrix is bounded (labels²). Centroid values
    round to 6 on both sides BEFORE the cosines, so the compounded
    float path stays oracle-reproducible at the 4-decimal outputs."""
    from etl_mudah_spark.operators.similarity import as_double

    emb = load(spark, sf_dir, "embeddings")
    long = emb.select(
        "label", F.posexplode(as_double(F.col("embedding"))).alias("pos", "val")
    )
    cent = long.groupBy("label", "pos").agg(
        F.round(F.avg("val"), 6).alias("cv")
    )
    # bounded: one row per label, array ordered by pos (an Aggregate on
    # the path, so the broadcast below is provably bounded to the audit)
    cent_arr = cent.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "cv"))),
            lambda s: s["cv"],
        ).alias("c")
    )
    dot = F.aggregate(
        F.zip_with(F.col("x"), F.col("c"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    sq = lambda col: F.aggregate(  # noqa: E731
        F.transform(col, lambda a: a * a), F.lit(0.0), lambda acc, v: acc + v
    )
    mem = (
        emb.select("label", as_double(F.col("embedding")).alias("x"))
        .join(F.broadcast(cent_arr), "label")
        .select(
            "label",
            (dot / (F.sqrt(sq(F.col("x"))) * F.sqrt(sq(F.col("c"))))).alias(
                "cos"
            ),
        )
    )
    coh = mem.groupBy("label").agg(F.round(F.avg("cos"), 4).alias("cohesion"))
    a = cent.select(F.col("label").alias("la"), "pos", F.col("cv").alias("av"))
    b = cent.select(F.col("label").alias("lb"), "pos", F.col("cv").alias("bv"))
    cc = (
        a.join(b, "pos")
        .where(F.col("la") != F.col("lb"))
        .groupBy("la", "lb")
        .agg(
            F.sum(F.col("av") * F.col("bv")).alias("dot"),
            F.sum(F.col("av") * F.col("av")).alias("na"),
            F.sum(F.col("bv") * F.col("bv")).alias("nb"),
        )
    )
    sep = cc.groupBy(F.col("la").alias("label")).agg(
        F.round(
            F.max(F.col("dot") / (F.sqrt("na") * F.sqrt("nb"))), 4
        ).alias("separation")
    )
    return (
        coh.join(sep, "label")
        .select(
            "label",
            "cohesion",
            "separation",
            F.round(F.col("cohesion") - F.col("separation"), 4).alias(
                "margin"
            ),
        )
        .orderBy("label")
    )


@register(
    "emb_label_outliers",
    oracle="""
    WITH cent AS (
        SELECT label, i AS pos, ROUND(AVG(embedding[i + 1]::DOUBLE), 6) AS cv
        FROM embeddings, UNNEST(range(len(embedding))) AS t(i)
        GROUP BY label, i
    ), mem AS (
        SELECT e.vec_id, e.label,
               ROUND(SUM(e.embedding[c.pos + 1]::DOUBLE * c.cv)
                     / (SQRT(SUM(e.embedding[c.pos + 1]::DOUBLE
                                 * e.embedding[c.pos + 1]::DOUBLE))
                        * SQRT(SUM(c.cv * c.cv))), 4) AS cos_centroid
        FROM embeddings e JOIN cent c ON c.label = e.label
        GROUP BY e.vec_id, e.label
    ), st AS (
        SELECT label, AVG(cos_centroid) AS mu,
               STDDEV_SAMP(cos_centroid) AS sd
        FROM mem GROUP BY label
    )
    SELECT m.vec_id, m.label, m.cos_centroid,
           ROUND((m.cos_centroid - s.mu) / NULLIF(s.sd, 0), 2) AS z
    FROM mem m JOIN st s USING (label)
    WHERE ROUND((m.cos_centroid - s.mu) / NULLIF(s.sd, 0), 2) <= -2.0
    ORDER BY m.label, m.vec_id
    """,
    doc=(
        "Label-conditional embedding outliers: members whose cosine to "
        "their own label centroid sits >= 2 sample-stddevs below the "
        "label mean — mislabel / contamination candidates."
    ),
)
def emb_label_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mislabel-detection read every labeled-corpus audit runs:
    score each member against its OWN label centroid, standardize
    within the label, and surface the low tail (z <= -2). A member far
    below its label's own cohesion distribution is a labeling error,
    a contamination artifact, or a genuine hard case — the instance-
    level companion to emb_label_separation's aggregate margin.

    Scale: centroids are the bounded (labels x dim) aggregate,
    broadcast assembled (same provably-Aggregate-bounded shape as
    emb_label_separation); members score map-side, the per-label
    stats are a labels-row relation equi-joined back. Per-member
    cosines round to 4 BEFORE the stats on both engines, z rounds to
    2 before the threshold compare, and sd=0 degenerate labels emit
    no rows (null z) — one shared float path end to end."""
    from etl_mudah_spark.operators.similarity import as_double

    emb = load(spark, sf_dir, "embeddings")
    long = emb.select(
        "label", F.posexplode(as_double(F.col("embedding"))).alias("pos", "val")
    )
    cent = long.groupBy("label", "pos").agg(
        F.round(F.avg("val"), 6).alias("cv")
    )
    cent_arr = cent.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "cv"))),
            lambda s: s["cv"],
        ).alias("c")
    )
    dot = F.aggregate(
        F.zip_with(F.col("x"), F.col("c"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    sq = lambda col: F.aggregate(  # noqa: E731
        F.transform(col, lambda a: a * a), F.lit(0.0), lambda acc, v: acc + v
    )
    mem = (
        emb.select(
            "vec_id", "label", as_double(F.col("embedding")).alias("x")
        )
        .join(F.broadcast(cent_arr), "label")
        .select(
            "vec_id",
            "label",
            F.round(
                dot / (F.sqrt(sq(F.col("x"))) * F.sqrt(sq(F.col("c")))), 4
            ).alias("cos_centroid"),
        )
    )
    st = mem.groupBy("label").agg(
        F.avg("cos_centroid").alias("mu"),
        F.stddev_samp("cos_centroid").alias("sd"),
    )
    z = F.round(
        (F.col("cos_centroid") - F.col("mu"))
        / F.when(F.col("sd") != 0, F.col("sd")),
        2,
    )
    return (
        mem.join(st, "label")
        .withColumn("z", z)
        .where(F.col("z") <= -2.0)
        .select("vec_id", "label", "cos_centroid", "z")
        .orderBy("label", "vec_id")
    )


def centroid_assemble(per: DataFrame) -> DataFrame:
    """Presentation-layer re-assembly of long-form centroids into one
    ``array<double>`` row per label, ordered by position."""
    return per.groupBy("label").agg(
        F.count("*").alias("dim"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "centroid_val"))),
            lambda s: s["centroid_val"],
        ).alias("centroid"),
    )


SPLIT_BUCKETS = (80, 90)  # doc_id % 100: <80 train, <90 val, else test
SHARD_TOKENS = 4096  # target tokens per packed shard


@register(
    "doc_train_split",
    oracle=f"""
    SELECT split, COUNT(*) AS n_docs,
           CAST(SUM(len({_WORDS_SQL})) AS BIGINT) AS total_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM (
        SELECT CASE WHEN doc_id % 100 < {SPLIT_BUCKETS[0]} THEN 'train'
                    WHEN doc_id % 100 < {SPLIT_BUCKETS[1]} THEN 'val'
                    ELSE 'test' END AS split,
               text, n_chars
        FROM documents
    )
    GROUP BY split ORDER BY split
    """,
    doc="Deterministic hash-bucket train/val/test split with per-split token totals.",
)
def doc_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible dataset splitting, the way a 100 TB pipeline must do
    it: assignment is a pure function of the stable key (doc_id % 100
    buckets), NOT an RNG sample — re-running on grown data keeps every
    old doc in its old split (no train/test leakage across runs), needs
    no seed bookkeeping, and is a map-only expression (zero shuffle
    beyond the final 3-group agg)."""
    docs = load(spark, sf_dir, "documents")
    split = (
        F.when(F.col("doc_id") % 100 < SPLIT_BUCKETS[0], "train")
        .when(F.col("doc_id") % 100 < SPLIT_BUCKETS[1], "val")
        .otherwise("test")
    )
    return (
        docs.select(
            split.alias("split"),
            tx.token_count("text").cast("bigint").alias("n_tok"),
            "n_chars",
        )
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("split")
    )


# Bucketed-packing parallelism: each source's sequential doc_id order
# splits into up to PACK_BUCKETS order-aligned ranges, so the packing
# cumsum runs |sources| × PACK_BUCKETS tasks instead of one task per
# source (VERDICT r10 item 2 — the fix the old docstring only
# documented). Raise for more parallelism; the offsets relation stays
# |sources| × PACK_BUCKETS rows, broadcast-sized at any corpus scale.
PACK_BUCKETS = 256


def _packing_cum(sf_dir: str, df: DataFrame, val_col: str) -> DataFrame:
    """Per-source running token sum in doc_id order — bucketed
    two-phase (operators/sampling.grouped_bucketed_running_sum), row-
    for-row equal to ``SUM(val) OVER (PARTITION BY source ORDER BY
    doc_id)`` but never streaming a whole source through one task.
    The bucket width derives from the documents table's footer row
    count (dense 0..n-1 doc_id contract), zero Spark jobs."""
    n = table_num_rows(sf_dir, "documents")
    b = max(1, -(-n // PACK_BUCKETS))
    # The two-phase running sum reads its input TWICE (per-bucket
    # totals, then the offset-joined per-bucket window), and every
    # caller's input here is expensive per row (words() regex split,
    # or the Arrow BPE encode in the shard-pack/corpus-prep paths). A
    # lazy localCheckpoint materializes the (source, doc_id, n_tok)
    # projection once inside the timed query instead of re-running the
    # text pass per consumer (round 14; the same pattern as
    # tfidf_cosine_pairs' tf boundary). Bytes stored are the projected
    # columns only, never the text.
    return smp.grouped_bucketed_running_sum(
        _materialize_once(df),
        ["source"],
        # integer DIV, not floor(x / b): double division loses exactness
        # past 2^53 doc_ids — still monotonic, but bucket widths would
        # silently drift from ceil(n/PACK_BUCKETS) (ADVICE r11)
        F.expr(f"doc_id DIV {b}").cast("bigint"),
        [F.col("doc_id")],
        F.col(val_col),
        "cum",
    )


@register(
    "doc_shard_pack",
    oracle=f"""
    WITH t AS (
        SELECT source, doc_id, len({_WORDS_SQL}) AS n_tok FROM documents
    ), c AS (
        SELECT source, n_tok,
               SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id) AS cum
        FROM t
    )
    SELECT source, CAST(FLOOR((cum - 1) / {SHARD_TOKENS}) AS INT) AS shard_id,
           COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS shard_tokens
    FROM c GROUP BY source, shard_id
    ORDER BY source, shard_id
    """,
    doc=f"Greedy sequential shard packing (~{SHARD_TOKENS} tokens) per source.",
)
def doc_shard_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into ~SHARD_TOKENS-token training shards, greedily
    in stable doc_id order within each source — the step between
    dedup/filtering and tokenizer output.

    Scale: the running sum is the BUCKETED two-phase form
    (:func:`_packing_cum`): per-(source, doc_id-range) partials plus
    per-source broadcast offsets, exactly equal to the one-window
    per-source cumsum (the oracle's spec) while parallelizing each
    source PACK_BUCKETS ways — a single giant source no longer
    serializes the packing stage. Shard assignment inside a bucket
    stays sequential, so determinism is preserved. Integer-only
    arithmetic: the oracle comparison is exact."""
    docs = load(spark, sf_dir, "documents").select(
        "source", "doc_id", tx.token_count("text").cast("bigint").alias("n_tok")
    )
    cum = _packing_cum(sf_dir, docs, "n_tok")
    return (
        cum.withColumn(
            "shard_id", F.floor((F.col("cum") - 1) / SHARD_TOKENS).cast("int")
        )
        .groupBy("source", "shard_id")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tok").alias("shard_tokens"))
        .orderBy("source", "shard_id")
    )


@register(
    "doc_shard_pack_global",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, source, len({_WORDS_SQL}) AS n_tok,
               md5(CAST(doc_id AS VARCHAR)) AS ok
        FROM documents
    ), c AS (
        SELECT doc_id, source, n_tok,
               SUM(n_tok) OVER (ORDER BY ok, doc_id) AS cum
        FROM w
    )
    SELECT CAST(FLOOR((cum - 1) / {SHARD_TOKENS}) AS INT) AS shard_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS shard_tokens,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id
    FROM c GROUP BY shard_id ORDER BY shard_id
    """,
    doc=(
        f"Source-mixed global shard packing (~{SHARD_TOKENS} tokens): "
        "token running sum over the deterministic md5 shuffle order, "
        "bucketed two-phase — no single-task window."
    ),
)
def doc_shard_pack_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The packing shape training runs actually want: shards cut from
    the md5-SHUFFLED corpus, so every shard mixes sources instead of
    concatenating one source's documents (doc_shard_pack is the
    per-source variant; doc_global_shuffle cuts by DOC COUNT — this
    cuts by TOKEN budget, the quantity loaders provision for).

    Scale: the global running token sum uses the same md5-prefix
    bucketing as md5_global_order — per-prefix totals, one bounded
    cumsum over 256 prefix rows, parallel per-prefix running sums
    (operators/sampling.bucketed_running_sum) — so the corpus is never
    sorted or summed through one task. Shard fingerprints (n_sources,
    sum_doc_id) pin membership and the source-mixing property, not
    just counts. Integer token sums: the oracle window twin is exact
    row for row."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        tx.token_count("text").cast("bigint").alias("n_tok"),
    )
    # The hex _ok stays a 32-char STRING deliberately: the 16-byte
    # unhex(md5) recode (order-preserving — Spark compares BinaryType
    # unsigned, pinned in tests/test_optimization_r14.py) was A/B'd in
    # round 14 at this x100 staging (checksum-identical over 122,504
    # shards) and measured NO faster — interleaved/rotated, fresh-
    # session, and an 11M-row synthetic isolation all read parity or
    # slightly worse (hex min 4.77 / med 5.44 vs bin 4.88 / 6.16 on the
    # isolation); UTF8String comparison is word-wise and the sort-key
    # bytes are not the bottleneck. See OPTIMIZATION_r14.md.
    ok = F.md5(F.col("doc_id").cast("string"))
    # Same double-read boundary as _packing_cum: without the lazy
    # checkpoint the scan + words() split + md5 run once for the
    # per-prefix totals AND once for the offset-joined window —
    # measured 19-29 s -> see OPTIMIZATION_r14.md at the x100
    # data-proportional staging. Stored rows are (doc_id, source,
    # n_tok, _ok) — ~60 B/doc, never the text.
    cum = smp.bucketed_running_sum(
        _materialize_once(docs.withColumn("_ok", ok)),
        F.substring("_ok", 1, 2),
        [F.col("_ok"), F.col("doc_id")],
        F.col("n_tok"),
        "cum",
    )
    return (
        cum.withColumn(
            "shard_id", F.floor((F.col("cum") - 1) / SHARD_TOKENS).cast("int")
        )
        .groupBy("shard_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("shard_tokens"),
            F.countDistinct("source").alias("n_sources"),
            F.sum("doc_id").alias("sum_doc_id"),
        )
        .orderBy("shard_id")
    )


# Append-stability holdout: the "already-published" corpus is every
# doc below the 90% doc_id cutoff; the remaining tail plays the role of
# a freshly-ingested batch (dense 0..n-1 ids make the global cutoff a
# per-source tail too).
PACK_STABILITY_BASE_FRACTION = 0.9
# The stability pin packs at a SMALLER budget than the production
# SHARD_TOKENS so that every sf dir — including the driver's sf0.01,
# where each source holds only ~1.4k tokens — produces CLOSED shards;
# with the production budget each source is one open shard there and
# the zero-violations check would be vacuous.
STABILITY_SHARD_TOKENS = 256


@register(
    "doc_shard_pack_stability",
    oracle=f"""
    WITH t AS (
        SELECT source, doc_id, len({_WORDS_SQL}) AS n_tok FROM documents
    ), cutoff AS (
        SELECT CAST(FLOOR({PACK_STABILITY_BASE_FRACTION} * COUNT(*)) AS BIGINT) AS c
        FROM documents
    ), fullp AS (
        SELECT source,
               CAST(FLOOR((SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id) - 1)
                    / {STABILITY_SHARD_TOKENS}) AS INT) AS shard_id,
               n_tok
        FROM t
    ), fsh AS (
        SELECT source, shard_id, COUNT(*) AS n_docs,
               CAST(SUM(n_tok) AS BIGINT) AS tokens
        FROM fullp GROUP BY 1, 2
    ), basep AS (
        SELECT source,
               CAST(FLOOR((SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id) - 1)
                    / {STABILITY_SHARD_TOKENS}) AS INT) AS shard_id,
               n_tok
        FROM t, cutoff WHERE doc_id < c
    ), bsh AS (
        SELECT source, shard_id, COUNT(*) AS n_docs,
               CAST(SUM(n_tok) AS BIGINT) AS tokens,
               MAX(shard_id) OVER (PARTITION BY source) AS max_sid
        FROM basep GROUP BY 1, 2
    ), cmp AS (
        SELECT b.source, b.shard_id, b.max_sid,
               (f.n_docs = b.n_docs AND f.tokens = b.tokens) AS same
        FROM bsh b JOIN fsh f USING (source, shard_id)
    )
    SELECT CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(COUNT(*) AS BIGINT) AS base_shards,
           CAST(SUM(CASE WHEN same THEN 1 ELSE 0 END) AS BIGINT)
               AS unchanged_shards,
           CAST(SUM(CASE WHEN NOT same AND shard_id < max_sid
                    THEN 1 ELSE 0 END) AS BIGINT) AS violations,
           SUM(CASE WHEN NOT same AND shard_id < max_sid
               THEN 1 ELSE 0 END) = 0 AS append_stable
    FROM cmp
    """,
    doc=(
        "Append-stability pin for sequential shard packing: packing the "
        "90% doc_id prefix and the full corpus must agree on every "
        "closed shard — only each source's LAST open shard may change "
        "when a batch appends."
    ),
)
def doc_shard_pack_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHY incremental shard publishing works: per-source doc_id-ordered
    packing gives appended docs (higher ids) no influence on earlier
    running sums, so every shard except each source's last open one is
    IMMUTABLE under append — re-running the packer on grown data
    re-publishes only tail shards, never rewrites history. This query
    PROVES the property on data instead of asserting it: pack the 90%
    prefix ("published corpus") and the full corpus ("after a batch")
    through the same bucketed two-phase cumsum (_packing_cum) and
    count closed-shard mismatches, which must be zero; a regression to
    any order-unstable assignment (hash, load-balanced, re-sorted)
    flips ``append_stable`` and hash-mismatches the driver row. The
    oracle re-derives both packings through the one-window spec.

    Scale: two packing passes (each |sources| x PACK_BUCKETS parallel)
    joined on (source, shard_id) — shard-count-sized relations — and
    one global summary row."""
    n = table_num_rows(sf_dir, "documents")
    cutoff = int(PACK_STABILITY_BASE_FRACTION * n)
    docs = load(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        tx.token_count("text").cast("bigint").alias("n_tok"),
    )

    def pack(df: DataFrame) -> DataFrame:
        return (
            _packing_cum(sf_dir, df, "n_tok")
            .withColumn(
                "shard_id",
                F.floor((F.col("cum") - 1) / STABILITY_SHARD_TOKENS).cast(
                    "int"
                ),
            )
            .groupBy("source", "shard_id")
            .agg(
                F.count("*").alias("n_docs"),
                F.sum("n_tok").cast("bigint").alias("tokens"),
            )
        )

    from pyspark.sql import Window as W

    fsh = pack(docs).select(
        "source",
        "shard_id",
        F.col("n_docs").alias("f_docs"),
        F.col("tokens").alias("f_tokens"),
    )
    bsh = pack(docs.where(F.col("doc_id") < cutoff)).withColumn(
        "max_sid", F.max("shard_id").over(W.partitionBy("source"))
    )
    cmp = bsh.join(fsh, ["source", "shard_id"]).select(
        "source",
        "shard_id",
        "max_sid",
        (
            (F.col("f_docs") == F.col("n_docs"))
            & (F.col("f_tokens") == F.col("tokens"))
        ).alias("same"),
    )
    closed_bad = (~F.col("same")) & (F.col("shard_id") < F.col("max_sid"))
    return cmp.agg(
        F.countDistinct("source").cast("bigint").alias("n_sources"),
        F.count("*").cast("bigint").alias("base_shards"),
        F.sum(F.col("same").cast("int")).cast("bigint").alias("unchanged_shards"),
        F.sum(closed_bad.cast("int")).cast("bigint").alias("violations"),
        (F.sum(closed_bad.cast("int")) == 0).alias("append_stable"),
    )


SHUFFLE_SHARD_DOCS = 50  # docs per shard after the global shuffle


@register(
    "doc_global_shuffle",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, len({_WORDS_SQL}) AS n_tok FROM documents
    ), o AS (
        SELECT doc_id, n_tok,
               ROW_NUMBER() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
                   AS rn
        FROM w
    )
    SELECT CAST(FLOOR((rn - 1) / {SHUFFLE_SHARD_DOCS}) AS INT) AS shard_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           MIN(doc_id) AS min_doc_id,
           CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id
    FROM o GROUP BY shard_id ORDER BY shard_id
    """,
    doc=f"Deterministic md5-order global shuffle into {SHUFFLE_SHARD_DOCS}-doc shards.",
)
def doc_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible pre-training shuffle: order the corpus by
    ``md5(doc_id)`` (a pure function of the stable key — no RNG state,
    identical across engines and re-runs) and cut the order into
    fixed-size shards. The oracle's single-task ``ROW_NUMBER() OVER
    (ORDER BY ...)`` is the semantic spec; the engine computes the SAME
    global position scalably via md5-prefix bucketing + per-bucket
    windows + driver prefix-summed offsets (256 parallel sorts instead
    of one global one) — see operators/sampling.py:md5_global_order.
    Shard fingerprints (min/sum of doc_id) make membership, not just
    counts, oracle-checked."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", tx.token_count("text").cast("bigint").alias("n_tok")
    )
    ordered = smp.md5_global_order(docs, "doc_id")
    return (
        ordered.withColumn(
            "shard_id",
            F.floor((F.col("rn") - 1) / SHUFFLE_SHARD_DOCS).cast("int"),
        )
        .groupBy("shard_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
            F.min("doc_id").alias("min_doc_id"),
            F.sum("doc_id").alias("sum_doc_id"),
        )
        .orderBy("shard_id")
    )


CMS_EPS = 0.001  # relative-error bound: est <= exact + eps * N
CMS_CONFIDENCE = 0.99
CMS_DEPTH = 5  # ceil(ln(1/(1-confidence))) for confidence=0.99
CMS_WIDTH = 2719  # ceil(e / eps) (Cormode & Muthukrishnan 2005)


@register(
    "vocab_cms_topk",
    oracle=rf"""
    WITH terms AS (
        SELECT lower(UNNEST({{words}})) AS term FROM documents
    )
    SELECT term, CAST(COUNT(*) AS BIGINT) AS exact_cnt, TRUE AS cms_ok
    FROM terms GROUP BY term
    ORDER BY exact_cnt DESC, term ASC LIMIT 10
    """.replace("{words}", r"string_split_regex(trim(text), '\s+')"),
    doc=(
        "Exact top-10 term counts plus a boolean asserting the "
        "count-min-sketch estimate is within its guaranteed band "
        "(exact <= est <= exact + 2*eps*N)."
    ),
)
def vocab_cms_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The third mergeable sketch next to HLL (events_user_hll) and GK
    quantiles (events_value_quantiles): a count-min sketch of corpus
    term frequencies. The sketch is a fixed-size 2-d counter array that
    merges associatively, so per-partition partials roll up in one
    reduce — heavy-hitter tracking at 100 TB without the full
    term->count shuffle an exact count needs.

    The sketch is built as PLAIN DATAFRAME ALGEBRA over the public
    Column API (round 6 — replacing the version-brittle
    ``spark._jvm…CountMinSketch`` probe): counter cell (i, b) of the
    depth×width array is the count of term occurrences with
    ``pmod(xxhash64(term, i), width) = b`` — a single groupBy whose
    map-side partial aggregation IS the per-partition sketch and whose
    shuffle merges them (≤ depth·width = 13 595 rows moved, regardless
    of corpus size). Probing joins the top-10 terms' (row, bucket)
    coordinates against the broadcast sketch and takes min-over-rows.
    One job, no driver collect, no private API.

    Driver-checkable invariant shape (round 5): the estimate is
    hash-family-specific, so the output carries the exact count (DuckDB
    reproduces it) plus ``cms_ok`` asserting the estimate obeys the CMS
    contract — est >= exact always (counters only ever add), and
    est <= exact + 2*eps*N (double the one-sided eps*N bound;
    P(violation) ~ (2e)^-depth ~ 2e-4 per term at depth 5; xxhash64 is
    deterministic, so at fixed data the value is too). Tighter per-term
    bounds pinned in tests/test_sketches.py."""
    docs = load(spark, sf_dir, "documents")
    terms = docs.select(F.explode(tx.words("text")).alias("t")).select(
        F.lower("t").alias("term")
    )

    def coords(col):
        return F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row_i"),
                        F.pmod(
                            F.xxhash64(col, F.lit(i)), F.lit(CMS_WIDTH)
                        ).alias("bucket"),
                    )
                    for i in range(CMS_DEPTH)
                ]
            )
        )

    sketch = (
        terms.select(coords(F.col("term")).alias("h"))
        .groupBy("h.row_i", "h.bucket")
        .agg(F.count("*").alias("cell_cnt"))
    )
    exact10 = (
        terms.groupBy("term")
        .agg(F.count("*").alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), F.asc("term"))
        .limit(10)
    )
    est = (
        exact10.select(
            "term", "exact_cnt", coords(F.col("term")).alias("h")
        )
        .select("term", "exact_cnt", "h.row_i", "h.bucket")
        .join(F.broadcast(sketch), ["row_i", "bucket"])
        .groupBy("term", "exact_cnt")
        .agg(F.min("cell_cnt").alias("est"))
    )
    n_df = terms.agg(F.count("*").alias("n"))
    return (
        est.crossJoin(F.broadcast(n_df))
        .select(
            "term",
            "exact_cnt",
            (
                (F.col("exact_cnt") <= F.col("est"))
                & (
                    F.col("est")
                    <= F.col("exact_cnt")
                    + 2 * F.ceil(F.lit(CMS_EPS) * F.col("n"))
                )
            ).alias("cms_ok"),
        )
        .orderBy(F.desc("exact_cnt"), F.asc("term"))
    )


ZIPF_TOP_K = 200


@register(
    "vocab_zipf_fit",
    oracle=f"""
    WITH tf AS (
        SELECT lower(term) AS term, COUNT(*) AS freq
        FROM (SELECT UNNEST({_WORDS_SQL}) AS term FROM documents)
        GROUP BY 1
    ), top AS (
        SELECT term, freq FROM tf
        ORDER BY freq DESC, term ASC LIMIT {ZIPF_TOP_K}
    ), ranked AS (
        SELECT freq,
               ROW_NUMBER() OVER (ORDER BY freq DESC, term ASC) AS rnk
        FROM top
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_terms,
           ROUND(regr_slope(ln(freq), ln(rnk)), 6) AS zipf_slope,
           ROUND(regr_intercept(ln(freq), ln(rnk)), 6) AS zipf_intercept,
           ROUND(regr_r2(ln(freq), ln(rnk)), 6) AS fit_r2
    FROM ranked
    """,
    doc=(
        "Zipf law fit over the corpus vocabulary: OLS of log-frequency "
        "on log-rank for the top-200 terms."
    ),
)
def vocab_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus health diagnostic: natural text follows Zipf's law (log
    frequency ~ -1 x log rank); a slope far from -1 or a poor fit flags
    synthetic/templated/spam-heavy corpora before they reach training.
    Closed-form OLS via the regr_* aggregate family on both engines.

    Scale: term frequencies reduce corpus-wide via one hash agg; only
    the TakeOrdered top-K (a K-row result computed distributed, K=200)
    feeds the rank window — the single-partition window sees K rows,
    never the vocabulary (allowlisted in tests/test_scale_audit.py
    with the other bounded post-aggregation windows)."""
    from pyspark.sql import Window as W

    docs = load(spark, sf_dir, "documents")
    tf = (
        docs.select(F.explode(tx.words("text")).alias("term"))
        .select(F.lower("term").alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("freq"))
    )
    top = tf.orderBy(F.desc("freq"), F.asc("term")).limit(ZIPF_TOP_K)
    ranked = top.withColumn(
        "rnk", F.row_number().over(W.orderBy(F.desc("freq"), F.asc("term")))
    )
    lf, lr = F.log("freq"), F.log("rnk")
    return ranked.agg(
        F.count("*").alias("n_terms"),
        F.round(F.regr_slope(lf, lr), 6).alias("zipf_slope"),
        F.round(F.regr_intercept(lf, lr), 6).alias("zipf_intercept"),
        F.round(F.regr_r2(lf, lr), 6).alias("fit_r2"),
    )


@register(
    "doc_unigram_surprisal",
    oracle=f"""
    WITH tok AS (
        SELECT source, lower(term) AS term
        FROM (SELECT source, UNNEST({_WORDS_SQL}) AS term FROM documents)
    ), tf AS (
        SELECT term, COUNT(*) AS freq FROM tok GROUP BY term
    ), tot AS (
        SELECT COUNT(*) AS n_total FROM tok
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CAST(-ln(freq * 1.0 / n_total) AS DECIMAL(18,6)))
                AS DOUBLE) / COUNT(*) AS mean_surprisal
    FROM tok JOIN tf USING (term) CROSS JOIN tot
    GROUP BY source
    """,
    doc=(
        "Per-domain mean token surprisal (cross-entropy vs the corpus "
        "unigram LM): an info-theoretic quality/outlier diagnostic."
    ),
)
def doc_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-level cross-entropy against the corpus's own unigram
    model: mean over a domain's TOKENS of -ln p(term), p = corpus term
    frequency. Low-surprisal domains are repetitive/templated; spikes
    flag vocabulary drift or junk — the cheap LM-free cousin of
    perplexity filtering.

    Determinism across engines: the double division freq/n_total and
    libm ln are bit-identical (same doubles in, same out — the Zipf
    query pins the same pair), and each token's surprisal is cast to
    DECIMAL(18,6) before summation (the dsum discipline) so the
    association order of the sum can't matter.

    Scale: term frequencies reduce via one hash agg; the (term, freq)
    vocabulary broadcasts back onto the token stream (word vocab is
    bounded — millions of rows, MBs — even at 100 TB; swap to a
    shuffle join for open-ended token spaces), and the 1-row total
    rides a broadcast crossJoin, never a collect.
    """
    docs = load(spark, sf_dir, "documents").select("source", "text")
    tok = docs.select(
        "source", F.explode(tx.words("text")).alias("term")
    ).select("source", F.lower("term").alias("term"))
    tf = tok.groupBy("term").agg(F.count("*").alias("freq"))
    # Corpus token total = sum of the term frequencies: re-aggregate
    # the |vocab|-row tf frame rather than re-scanning and re-exploding
    # the corpus a third time for a plain count.
    total = tf.agg(F.sum("freq").alias("n_total"))
    surprisal = -F.log(F.col("freq") / F.col("n_total"))
    return (
        tok.join(F.broadcast(tf), "term")
        .crossJoin(F.broadcast(total))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_tokens"),
            (
                F.sum(surprisal.cast("decimal(18,6)")).cast("double")
                / F.count("*")
            ).alias("mean_surprisal"),
        )
    )


RRF_K = 60
RRF_DEPTH = 20
# SQL twin of operators/similarity.py cosine() for the oracle below.
_RRF_COS_SQL = """
    list_sum(list_transform(list_zip(a.v, b.v), x -> x[1] * x[2]))
    / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
       * sqrt(list_sum(list_transform(b.v, x -> x * x))))
"""


@register(
    "doc_hybrid_rrf",
    oracle=rf"""
    WITH tok AS (
        SELECT doc_id,
               len({_WORDS_SQL}) AS dl,
               lower(UNNEST({_WORDS_SQL})) AS term
        FROM documents
    ), tf AS (
        SELECT doc_id, term,
               COUNT(*)::DOUBLE AS tf, ANY_VALUE(dl)::DOUBLE AS dl
        FROM tok WHERE term IN ('spark', 'window', 'merge')
        GROUP BY doc_id, term
    ), dfreq AS (
        SELECT term, COUNT(*)::DOUBLE AS df FROM tf GROUP BY term
    ), stats AS (
        SELECT COUNT(*)::DOUBLE AS n,
               AVG(len({_WORDS_SQL}))::DOUBLE AS avgdl
        FROM documents
    ), bm25 AS (
        SELECT doc_id,
               SUM(
                   ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))
                   * tf.tf * ({BM25_K1} + 1)
                   / (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * tf.dl / s.avgdl))
               ) AS score
        FROM tf JOIN dfreq d USING (term), stats s
        GROUP BY doc_id
    ), lex AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS r
        FROM bm25 QUALIFY r <= {RRF_DEPTH}
    ), e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), cos AS (
        SELECT a.vec_id AS doc_id, ROUND({_RRF_COS_SQL}, 4) AS score
        FROM e a, (SELECT v FROM e WHERE vec_id = 0) b
    ), vec AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS r
        FROM cos QUALIFY r <= {RRF_DEPTH}
    )
    SELECT COALESCE(lex.doc_id, vec.doc_id) AS doc_id,
           ROUND(COALESCE(1.0 / ({RRF_K} + lex.r), 0)
                 + COALESCE(1.0 / ({RRF_K} + vec.r), 0), 6) AS rrf_score
    FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id
    ORDER BY rrf_score DESC, doc_id ASC
    LIMIT 10
    """,
    doc=(
        "Hybrid retrieval: reciprocal-rank fusion of the BM25 top-20 "
        "and the cosine-ANN top-20, final top-10 by fused score."
    ),
)
def doc_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The standard hybrid-search combiner: lexical (BM25) and vector
    (cosine) rankers each produce a depth-20 list, fused by reciprocal
    rank — score = sum over lists of 1/(k + rank), k=60 — so a doc
    strong in either modality surfaces without score calibration
    between incomparable scales.

    Scale: each ranker is its own scale-correct plan (BM25: pre-shuffle
    term filter + broadcast stats; cosine: map-only scan +
    TakeOrdered); the fusion joins two DEPTH-row lists — driver-free,
    and the rank windows run over those bounded lists, never the
    corpus. Docs outside the embedded corpus (vec_id space) simply
    take the lexical term only — full-outer fusion, no inner-join
    retrieval bias.
    """
    from pyspark.sql import Window as W

    from etl_mudah_spark.operators import similarity as sim

    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")

    lex_top = (
        _bm25_scored(docs, BM25_QUERY)
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(RRF_DEPTH)
    )
    lex = lex_top.select(
        "doc_id",
        F.row_number()
        .over(W.orderBy(F.desc("bm25"), F.asc("doc_id")))
        .alias("r_lex"),
    )
    vec_top = sim.brute_force_topk_df(emb, sim.probe_row(emb), k=RRF_DEPTH)
    vec = vec_top.select(
        F.col("vec_id").alias("doc_id"),
        F.row_number()
        .over(W.orderBy(F.desc("cosine_sim"), F.asc("vec_id")))
        .alias("r_vec"),
    )
    rrf = F.coalesce(1.0 / (RRF_K + F.col("r_lex")), F.lit(0.0)) + F.coalesce(
        1.0 / (RRF_K + F.col("r_vec")), F.lit(0.0)
    )
    return (
        lex.join(vec, "doc_id", "full_outer")
        .select("doc_id", F.round(rrf, 6).alias("rrf_score"))
        .orderBy(F.desc("rrf_score"), F.asc("doc_id"))
        .limit(10)
    )


# Real-BPE token stats (VERDICT r5 item 7). n_merges is deliberately
# UNDER-trained for this corpus's ~100-word vocabulary so genuine
# subword splits remain (200 merges fully fuse every word and the count
# degenerates to the whitespace count): measured per-doc fertility
# (n_bpe / n_words) at 50 merges is 1.77-3.89 across
# sf0.001/sf0.01/sf0.1, so the [1.2, 4.5] band is non-vacuous — a
# whitespace proxy (fertility 1.0) and a char-level count (~6+) both
# FAIL it.
BPE_N_MERGES = 50
BPE_FERTILITY_LO = 1.2
BPE_FERTILITY_HI = 4.5


@register(
    "doc_bpe_token_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(len({_WORDS_SQL}) AS BIGINT) AS n_words,
           CAST(length(text) AS BIGINT) AS n_chars,
           TRUE AS bpe_ok
    FROM documents
    """,
    doc=(
        "Real BPE token counts (corpus-trained merges, Arrow-batched "
        "apply) with per-doc invariant bounds vs the exact word/char "
        "counts."
    ),
)
def doc_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document REAL byte-pair-encoding token counts — the subword
    number token-budget mixing actually needs, not the regex proxy
    (operators/text.py bpe_token_count). See operators/bpe.py for the
    train/apply scale contract: deterministic capped driver sample for
    the merge rules (like PQ codebooks), one Arrow-batched memoized map
    pass for the apply.

    Invariant-twin shape: the BPE count itself is merge-table-specific
    (DuckDB can't run the fusion loop), so the driver rows carry the
    exact word and char counts (DuckDB twin) plus ``bpe_ok`` asserting
    n_words <= n_bpe <= n_chars and the measured fertility band — tight
    enough that the whitespace count (fertility 1.0) or a char count
    (~6+) would flip it false."""
    from etl_mudah_spark.operators import bpe

    docs = load(spark, sf_dir, "documents")
    merges = bpe.bpe_train(docs, n_merges=BPE_N_MERGES)
    counted = bpe.bpe_token_counts(docs, merges)
    fert = F.col("n_bpe") / F.col("n_words")
    # Structural upper bound is n_chars + 1, not n_chars: a word whose
    # chars hit NO learned merge encodes to len(word)+1 tokens (the
    # </w> marker), and summed over single-space-joined words that is
    # n_chars - (n_words-1) + n_words = n_chars + 1 exactly. Empty /
    # whitespace-only docs are vacuously TRUE (matching the oracle
    # literal): the Spark-side split of '' counts 1 "word" while the
    # tokenizer sees none, so no non-vacuous bound exists there.
    band = (
        (F.col("n_bpe") >= F.col("n_words"))
        & (F.col("n_bpe") <= F.col("n_chars") + 1)
        & (fert >= BPE_FERTILITY_LO)
        & (fert <= BPE_FERTILITY_HI)
    )
    return counted.select(
        "doc_id",
        tx.token_count("text").cast("bigint").alias("n_words"),
        F.length("text").cast("bigint").alias("n_chars"),
        "n_bpe",
        F.trim("text").alias("_trimmed"),
    ).select(
        "doc_id",
        "n_words",
        "n_chars",
        F.when(F.col("_trimmed") == "", F.lit(True))
        .otherwise(band)
        .alias("bpe_ok"),
    )


# ---------------------------------------------------------------------------
# BPE token-ID sequences against a FIXTURE merge table (VERDICT r6
# item 4): doc_bpe_token_stats verifies counts through invariant
# bounds; this query verifies the ENCODING itself — exact id
# sequences, reproduced independently by the oracle.
#
# The fixture is fixed (not corpus-trained) precisely so the oracle can
# re-run the apply: DuckDB executes the same rank-ordered fusion as a
# recursive CTE (sequential rule order; equivalent to the lowest-rank
# iterative apply because a fused symbol can only appear as a
# component of LATER rules — the well-formedness every trained merge
# list has, and this fixture preserves). Rules chain up to five deep
# ("table" -> one token) and leave partial fusions elsewhere, so a
# wrong tie-break, a wrong rule order, or a boundary bug in either
# engine flips the hash.
# ---------------------------------------------------------------------------
BPE_FIXTURE_MERGES: list[tuple[str, str]] = [
    ("e", "</w>"),
    ("t", "a"),
    ("ta", "b"),
    ("tab", "l"),
    ("tabl", "e</w>"),
    ("a", "</w>"),
    ("r", "o"),
    ("ro", "w"),
    ("row", "</w>"),
    ("s", "c"),
    ("sc", "a"),
    ("sca", "n"),
    ("scan", "</w>"),
    ("a", "g"),
    ("ag", "g"),
    ("agg", "</w>"),
]

_BPE_SEP = chr(31)  # unit separator: never appears in corpus text


def _bpe_doc_ids_cte(prefix_ctes: str = "", d_body: str | None = None) -> str:
    """Shared oracle WITH-block: per-document exact BPE id sequences
    under the fixture (``per_doc(doc_id, source, ids_str, n_ids)``).

    ``prefix_ctes`` lets a composed pipeline (corpus_prep_e2e) insert
    its own CTE chain between the fixture tables and the ``d`` stage;
    ``d_body`` overrides what feeds the encoder — it must produce
    ``(doc_id, source, ws)`` with ``ws`` the non-empty word list."""
    from etl_mudah_spark.operators.bpe import bpe_vocab

    s = _BPE_SEP
    rules_sql = ", ".join(
        f"({i}, '{a}', '{b}')" for i, (a, b) in enumerate(BPE_FIXTURE_MERGES)
    )
    vocab_sql = ", ".join(
        f"('{sym}', {vid})" for sym, vid in bpe_vocab(BPE_FIXTURE_MERGES).items()
    )
    n = len(BPE_FIXTURE_MERGES)
    d_sql = d_body or (
        f"SELECT doc_id, source, list_filter({_WORDS_SQL}, w -> w <> '') AS ws"
        " FROM documents"
    )
    prefix = f"{prefix_ctes}," if prefix_ctes else ""
    return f"""
    WITH RECURSIVE
    rules(r, a, b) AS (VALUES {rules_sql}),
    vocab(sym, id) AS (VALUES {vocab_sql}),
    {prefix}
    d AS (
        {d_sql}
    ),
    w AS (
        SELECT doc_id, unnest(ws) AS word,
               unnest(range(1, len(ws) + 1)) AS pos
        FROM d
    ),
    dw AS (SELECT DISTINCT word FROM w),
    -- rank-ordered apply: fuse the LEFTMOST occurrence of rule r, or
    -- advance to rule r+1 when absent; separators anchor symbol
    -- boundaries so a rule never matches inside a longer symbol
    enc(word, seq, r) AS (
        SELECT word,
               '{s}' || array_to_string(regexp_split_to_array(word, ''), '{s}')
               || '{s}' || '</w>' || '{s}',
               0
        FROM dw
        UNION ALL
        SELECT e.word,
               CASE WHEN p.pos > 0
                    THEN substr(e.seq, 1, p.pos - 1) || '{s}' || ru.a || ru.b
                         || '{s}' || substr(
                             e.seq,
                             p.pos + length('{s}' || ru.a || '{s}' || ru.b || '{s}'))
                    ELSE e.seq END,
               CASE WHEN p.pos > 0 THEN e.r ELSE e.r + 1 END
        FROM enc e
        JOIN rules ru ON ru.r = e.r
        CROSS JOIN LATERAL (
            SELECT instr(e.seq, '{s}' || ru.a || '{s}' || ru.b || '{s}') AS pos
        ) p
        WHERE e.r < {n}
    ),
    toks AS (
        SELECT word,
               unnest(string_split(trim(seq, '{s}'), '{s}')) AS sym,
               unnest(range(1, len(string_split(trim(seq, '{s}'), '{s}')) + 1))
                   AS tpos
        FROM enc WHERE r = {n}
    ),
    word_ids AS (
        SELECT word,
               string_agg(CAST(COALESCE(v.id, unicode(t.sym)) AS VARCHAR),
                          ' ' ORDER BY t.tpos) AS ids_str,
               COUNT(*) AS n
        FROM toks t LEFT JOIN vocab v ON v.sym = t.sym
        GROUP BY word
    ),
    doc_enc AS (
        SELECT w.doc_id,
               string_agg(wi.ids_str, ' ' ORDER BY w.pos) AS ids_str,
               SUM(wi.n) AS n_ids
        FROM w JOIN word_ids wi USING (word)
        GROUP BY w.doc_id
    ),
    per_doc AS (
        SELECT d.doc_id, d.source,
               COALESCE(e.ids_str, '') AS ids_str,
               CAST(COALESCE(e.n_ids, 0) AS BIGINT) AS n_ids
        FROM d LEFT JOIN doc_enc e USING (doc_id)
    )
    """


@register(
    "doc_bpe_encode",
    oracle=_bpe_doc_ids_cte()
    + """
    SELECT doc_id, ids_str, n_ids FROM per_doc ORDER BY doc_id
    """,
    doc=(
        "Exact BPE token-ID sequences (fixture merge table, "
        "space-joined ids + count per doc) — the oracle re-runs the "
        "rank-ordered fusion as a recursive CTE."
    ),
)
def doc_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-ID sequences for every document under BPE_FIXTURE_MERGES —
    the operators/bpe.py:bpe_encode surface (Arrow-batched memoized
    apply, map-only) verified to the id level: the driver hashes the
    space-joined id string per document, and the oracle reproduces the
    exact sequence by running the same rank-ordered fusion in SQL. A
    fertility band or count bound cannot catch a wrong-but-plausible
    segmentation; an id-sequence hash catches a one-token drift in one
    document.

    Scale: identical to bpe_token_counts — embarrassingly parallel
    scan work, the per-batch memo absorbing the Zipfian word mass; ids
    join shard packing (operators/sampling.py doc_shard_pack) as the
    payload the packed token budgets describe.
    """
    from etl_mudah_spark.operators import bpe

    docs = load(spark, sf_dir, "documents")
    encoded = bpe.bpe_encode(docs, BPE_FIXTURE_MERGES)
    return encoded.select(
        "doc_id",
        F.array_join("bpe_ids", " ").alias("ids_str"),
        F.size("bpe_ids").cast("bigint").alias("n_ids"),
    ).orderBy("doc_id")


@register(
    "doc_shard_pack_bpe",
    oracle=_bpe_doc_ids_cte()
    + f"""
    , c AS (
        SELECT source, doc_id, ids_str, n_ids,
               SUM(n_ids) OVER (PARTITION BY source ORDER BY doc_id) AS cum
        FROM per_doc
    )
    SELECT source,
           CAST(FLOOR((cum - 1) / {SHARD_TOKENS}) AS INT) AS shard_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_ids) AS BIGINT) AS shard_tokens,
           md5(string_agg(ids_str, ' ' ORDER BY doc_id)) AS payload_md5
    FROM c GROUP BY source, shard_id
    ORDER BY source, shard_id
    """,
    doc=(
        f"Shard packing (~{SHARD_TOKENS} tokens) over REAL BPE id "
        "sequences (fixture vocab), with an exact per-shard payload "
        "hash — the tokenizer-to-training-shard link."
    ),
)
def doc_shard_pack_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_shard_pack with the tokenizer closed over it (VERDICT r6
    item 4's endgame): shard budgets count REAL BPE token ids
    (operators/bpe.py bpe_encode under BPE_FIXTURE_MERGES), and each
    shard row carries ``payload_md5`` — the md5 of the shard's full
    space-joined id sequence in doc order. The oracle rebuilds the id
    sequences with the recursive-CTE apply and must reproduce the SAME
    digest, so a one-token drift in one document flips the hash of its
    shard. This is the training-data output format check: what a
    downstream loader would read is what's verified.

    Scale: encode is the map-only Arrow pass; packing is the same
    bucketed two-phase running sum as doc_shard_pack (_packing_cum —
    parallel across sources AND doc_id ranges, sequential semantics
    preserved); the payload digest folds per shard via sorted
    collect_list, bounded by shard size (~SHARD_TOKENS tokens), never
    corpus size.
    """
    from etl_mudah_spark.operators import bpe

    docs = load(spark, sf_dir, "documents")
    enc = bpe.bpe_encode(docs, BPE_FIXTURE_MERGES).select(
        "source",
        "doc_id",
        F.array_join("bpe_ids", " ").alias("ids_str"),
        F.size("bpe_ids").cast("bigint").alias("n_ids"),
    )
    cum = _packing_cum(sf_dir, enc, "n_ids")
    packed = cum.withColumn(
        "shard_id", F.floor((F.col("cum") - 1) / SHARD_TOKENS).cast("int")
    )
    # doc-ordered payload without a second window: collect (doc_id,
    # ids_str) structs, array_sort orders by the leading doc_id field.
    payload = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("doc_id", "ids_str"))),
            lambda s: s["ids_str"],
        ),
        " ",
    )
    return (
        packed.groupBy("source", "shard_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_ids").alias("shard_tokens"),
            F.md5(payload).alias("payload_md5"),
        )
        .orderBy("source", "shard_id")
    )


@register(
    "doc_bigram_pmi",
    oracle=f"""
    WITH w AS (
        SELECT doc_id,
               list_filter(list_transform({_WORDS_SQL}, x -> lower(x)),
                           x -> x <> '') AS ws
        FROM documents
    ), uni AS (
        SELECT unnest(ws) AS t FROM w
    ), cu AS (
        SELECT t, COUNT(*) AS c FROM uni GROUP BY t
    ), bg AS (
        SELECT ws[i] AS a, ws[i+1] AS b
        FROM w, UNNEST(range(1, len(ws))) AS r(i)
        WHERE len(ws) >= 2
    ), cb AS (
        SELECT a, b, COUNT(*) AS pair_count FROM bg GROUP BY a, b
    ), tot AS (
        SELECT (SELECT COUNT(*) FROM uni) AS u,
               (SELECT COUNT(*) FROM bg) AS bt
    )
    SELECT a, b, pair_count,
           ROUND(ln(pair_count * 1.0 * u / bt * u / ca.c / cbb.c), 6)
               AS pmi
    FROM cb, tot
    JOIN cu ca ON ca.t = a
    JOIN cu cbb ON cbb.t = b
    WHERE pair_count >= 5
    ORDER BY pmi DESC, a, b
    LIMIT 20
    """,
    doc=(
        "Top-20 bigram collocations by pointwise mutual information "
        "(lowercased whitespace tokens, min pair count 5)."
    ),
)
def doc_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: PMI = ln(p(ab) / (p(a)·p(b))) with p(ab)
    over adjacent-pair occurrences and p(·) over unigram occurrences —
    the standard corpus-linguistics ranking of phrases that co-occur
    far above chance (multi-word entities, templated boilerplate), a
    routine pre-tokenizer diagnostic for training corpora.

    Plan shape: ONE scan feeds both the unigram explode and the
    positional-pair explode (adjacent pairs via an index transform
    over the split array, bound once per row — the word_ngrams
    evaluation discipline); each side is a map-side-combined count
    shuffle keyed by word/pair; the two grand totals fold in as a
    1-row broadcast crossJoin, and the per-word counts join back onto
    the (vocabulary-sized, corpus-independent) pair-count table keyed
    by word. Nothing driver-side, nothing quadratic; min-count 5
    prunes the hapax tail before the joins. Ranking orders by the
    ROUNDED pmi (6 dp) so the limit cut is stable across engines'
    last-ulp log differences.
    """
    docs = load(spark, sf_dir, "documents")
    wl = F.filter(
        F.transform(tx.words("text"), lambda x: F.lower(x)),
        lambda x: x != F.lit(""),
    )

    def pairs(wb):
        idx = F.sequence(F.lit(1), F.size(wb) - 1)
        return F.when(
            F.size(wb) >= 2,
            F.transform(
                idx,
                lambda i: F.struct(
                    F.element_at(wb, i).alias("a"),
                    F.element_at(wb, i + 1).alias("b"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))

    base = docs.select(
        wl.alias("ws"),
        F.element_at(F.transform(F.array(wl), pairs), 1).alias("bgs"),
    )
    uni = base.select(F.explode("ws").alias("t"))
    cu = uni.groupBy("t").agg(F.count("*").alias("c"))
    bg = base.select(F.explode("bgs").alias("p")).select("p.a", "p.b")
    cb = (
        bg.groupBy("a", "b")
        .agg(F.count("*").alias("pair_count"))
        .where(F.col("pair_count") >= 5)
    )
    tot = uni.agg(F.count("*").alias("u")).crossJoin(
        bg.agg(F.count("*").alias("bt"))
    )
    # Denominator stays in DOUBLE via sequential division: the naive
    # bt*ca_c*cb_c bigint product overflows int64 once the corpus has
    # ~1e12 tokens (bt ~ 1e12, frequent-word counts ~ 1e10 => ~1e32),
    # wrapping negative under non-ANSI semantics and silently corrupting
    # every PMI. The oracle SQL uses the identical operand order so the
    # IEEE results match bit-for-bit.
    pmi = F.round(
        F.log(
            F.col("pair_count")
            * 1.0
            * F.col("u")
            / F.col("bt")
            * F.col("u")
            / F.col("ca_c")
            / F.col("cb_c")
        ),
        6,
    )
    return (
        cb.crossJoin(F.broadcast(tot))
        .join(cu.select(F.col("t").alias("a"), F.col("c").alias("ca_c")), "a")
        .join(cu.select(F.col("t").alias("b"), F.col("c").alias("cb_c")), "b")
        .select("a", "b", "pair_count", pmi.alias("pmi"))
        .orderBy(F.desc("pmi"), "a", "b")
        .limit(20)
    )


@register(
    "doc_keyness_g2",
    oracle=rf"""
    WITH tok AS (
        SELECT CASE WHEN lang = 'de' THEN 1 ELSE 0 END AS dom,
               lower(t.term) AS term
        FROM documents, UNNEST({_WORDS_SQL}) AS t(term)
    ), cnt AS (
        SELECT term,
               SUM(dom) AS a,
               SUM(1 - dom) AS b
        FROM tok GROUP BY term
    ), tot AS (
        SELECT SUM(a) AS ta, SUM(b) AS tb FROM cnt
    ), scored AS (
        SELECT term, a, b,
               2.0 * (
                 CASE WHEN a > 0 THEN
                   a * ln(a / ((a + b) * 1.0 * ta / (ta + tb)))
                 ELSE 0.0 END
                 +
                 CASE WHEN b > 0 THEN
                   b * ln(b / ((a + b) * 1.0 * tb / (ta + tb)))
                 ELSE 0.0 END
               ) AS g2
        FROM cnt CROSS JOIN tot
        WHERE a * 1.0 * tb > b * 1.0 * ta
    )
    SELECT term,
           CAST(a AS BIGINT) AS cnt_dom,
           CAST(b AS BIGINT) AS cnt_rest,
           ROUND(g2, 4) AS g2
    FROM scored
    ORDER BY ROUND(g2, 4) DESC, term
    LIMIT 20
    """,
    doc=(
        "Log-likelihood (G²) keyness: the 20 terms most "
        "over-represented in German-labeled docs vs the rest of the "
        "corpus — Dunning's domain-term extraction, exact count-ratio "
        "arithmetic."
    ),
)
def doc_keyness_g2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-term extraction by Dunning log-likelihood: for each
    lowercased token, the 2×2 contingency (in-domain count a, rest
    count b, corpus totals) scores G² = 2·(a·ln(a/E_a) + b·ln(b/E_b));
    only over-represented terms kept (a/A > b/B as an exact bigint
    cross-multiplication — no float boundary), top 20 by rounded G².
    One (term) shuffle with map-side partials; the corpus totals are a
    1-row broadcast (sanctioned A13 re-aggregation); top-k is
    TakeOrdered, never a global sort. Each term's G² is independent
    count-ratio arithmetic — no summation-order sensitivity at all."""
    docs = load(spark, sf_dir, "documents").select("lang", "text")
    tok = docs.select(
        (F.col("lang") == "de").cast("int").alias("dom"),
        F.explode(tx.words("text")).alias("raw"),
    ).select("dom", F.lower("raw").alias("term"))
    cnt = tok.groupBy("term").agg(
        F.sum("dom").alias("a"), F.sum(1 - F.col("dom")).alias("b")
    )
    tot = cnt.agg(F.sum("a").alias("ta"), F.sum("b").alias("tb"))
    a, b = F.col("a"), F.col("b")
    ta, tb = F.col("ta"), F.col("tb")
    ea = (a + b) * 1.0 * ta / (ta + tb)
    eb = (a + b) * 1.0 * tb / (ta + tb)
    g2 = 2.0 * (
        F.when(a > 0, a * F.log(a / ea)).otherwise(0.0)
        + F.when(b > 0, b * F.log(b / eb)).otherwise(0.0)
    )
    return (
        cnt.join(F.broadcast(tot))
        .where(a * 1.0 * tb > b * 1.0 * ta)
        .select(
            "term",
            a.cast("bigint").alias("cnt_dom"),
            b.cast("bigint").alias("cnt_rest"),
            F.round(g2, 4).alias("g2"),
        )
        .orderBy(F.desc("g2"), "term")
        .limit(20)
    )


@register(
    "doc_readability",
    oracle=r"""
    WITH f AS (
        SELECT lang,
               len(string_split_regex(trim(text), '\s+')) AS nw,
               len(regexp_extract_all(lower(text), '[aeiouy]+')) AS syl,
               greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS sent
        FROM documents
    ), scored AS (
        SELECT lang, nw,
               206.835 - 1.015 * (nw * 1.0 / sent)
                       - 84.6 * (syl * 1.0 / nw) AS flesch
        FROM f
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CAST(nw AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
               AS mean_words,
           CAST(SUM(CAST(flesch AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
               AS mean_flesch,
           CAST(SUM(CASE WHEN flesch < 30 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hard
    FROM scored GROUP BY lang ORDER BY lang
    """,
    doc=(
        "Flesch reading-ease profile per language: vowel-run syllable "
        "heuristic, sentence-terminator counting, per-lang mean score "
        "and the count of very-hard (<30) documents."
    ),
)
def doc_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Readability as a corpus-quality dimension next to doc_quality's
    length/punct ratios: Flesch = 206.835 − 1.015·(words/sentence) −
    84.6·(syllables/word), with syllables approximated by vowel-group
    runs ([aeiouy]+ on the lowercased text) and sentences by
    terminator runs clamped to ≥1 — both pure regex COUNTS, so the
    per-doc score is engine-identical arithmetic on exact ints (the
    heuristic is crude for non-English, which is exactly why the
    profile groups by lang — compare within a language, not across).
    One map-side-combined aggregation; score sums ride the decimal
    lattice; the n_hard (<30) count is the actionable gate (filter or
    route to simplification). No UDF — regexp_count is JVM-side
    codegen."""
    docs = load(spark, sf_dir, "documents").select("lang", "text")
    nw = tx.token_count("text")
    syl = F.regexp_count(F.lower("text"), F.lit("[aeiouy]+"))
    sent = F.greatest(F.lit(1), F.regexp_count("text", F.lit("[.!?]+")))
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (nw * 1.0 / sent)
        - F.lit(84.6) * (syl * 1.0 / nw)
    )
    scored = docs.select("lang", nw.alias("nw"), flesch.alias("flesch"))
    dsum6 = lambda c: F.sum(c.cast("decimal(18,6)")).cast("double")  # noqa: E731
    return (
        scored.groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            (dsum6(F.col("nw")) / F.count("*")).alias("mean_words"),
            (dsum6(F.col("flesch")) / F.count("*")).alias("mean_flesch"),
            F.sum(F.when(F.col("flesch") < 30, 1).otherwise(0))
            .cast("bigint")
            .alias("n_hard"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# corpus_prep_e2e: the end-to-end corpus-preparation capstone.
#
# Every stage below is individually driver-green (doc_quality,
# doc_exact_dedup, doc_dedup_keep_best, doc_repeated_spans /
# doc_excise_repeated_spans, doc_token_budget_mix, doc_shard_pack_bpe);
# this query composes them into ONE pipeline and verifies the FINAL
# artifact — the published shard manifest with per-shard payload
# digests — against a DuckDB oracle that re-runs the whole chain in
# SQL. A drift anywhere (one doc wrongly gated, one wrong dedup
# survivor, one token not excised, one id off in one shard) flips a
# payload_md5.
#
# Candidate generation note: at 100 TB the near-dup stage runs
# MinHash-LSH banding (operators/dedup.py:minhash_near_dup) to FIND the
# pairs; the composed twin here uses the df-capped exact-Jaccard pair
# set — the established SQL-reproducible surrogate (doc_dedup_keep_best
# precedent) whose recall the sketch queries measure separately.
# ---------------------------------------------------------------------------
CORPUS_MIN_TOKENS = 12
CORPUS_MIN_TTR = 0.3
_CPE_NEARDUP_THRESHOLD = 0.2
_CPE_MIX_BUCKETS = 100


def _corpus_prep_oracle() -> str:
    """Assemble the full-pipeline oracle from the stage twins."""
    from etl_mudah_spark.plans import datapipe as dp

    n = dp.REPEATED_SPAN_N
    budget_sql = (
        f"CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0 "
        f"THEN {dp.TOKEN_BUDGET_EVEN} ELSE {dp.TOKEN_BUDGET_ODD} END"
    )
    pipeline = rf"""
    q AS (
        SELECT doc_id, source, text, len({_WORDS_SQL}) AS n_tokens
        FROM documents
        WHERE len({_WORDS_SQL}) >= {CORPUS_MIN_TOKENS}
          AND len(list_distinct({_WORDS_SQL})) * 1.0 / len({_WORDS_SQL})
              >= {CORPUS_MIN_TTR}
    ),
    ek AS (SELECT q.*, md5(substr(text, 1, 40)) AS k FROM q),
    e AS (
        SELECT doc_id, source, text, n_tokens FROM ek
        QUALIFY row_number() OVER (PARTITION BY k ORDER BY doc_id) = 1
    ),
    {dp._jaccard_pairs_ctes(_CPE_NEARDUP_THRESHOLD, from_rel="e")},
    edges AS (
        SELECT doc_a AS s, doc_b AS t FROM pairs
        UNION SELECT doc_b, doc_a FROM pairs
    ),
    cnodes AS (SELECT DISTINCT s AS node FROM edges),
    reach(node, r) AS (
        SELECT node, node FROM cnodes
        UNION
        SELECT eg.t, reach.r FROM reach JOIN edges eg ON eg.s = reach.node
    ),
    comp AS (SELECT node, MIN(r) AS cluster_id FROM reach GROUP BY node),
    cbest AS (
        SELECT comp.node FROM comp JOIN e ON e.doc_id = comp.node
        QUALIFY row_number() OVER (
            PARTITION BY cluster_id ORDER BY e.n_tokens DESC, comp.node ASC
        ) = 1
    ),
    nd AS (
        SELECT e.* FROM e
        WHERE doc_id NOT IN (
            SELECT node FROM comp WHERE node NOT IN (SELECT node FROM cbest)
        )
    ),
    ndw AS (SELECT w.doc_id, w.w FROM words w JOIN nd USING (doc_id)),
    sg AS (
        SELECT doc_id, i AS pos,
               list_aggregate(w[i:i+{n - 1}], 'string_agg', ' ') AS gram
        FROM ndw, UNNEST(range(1, len(w) - {n - 2})) AS u(i)
        WHERE len(w) >= {n}
    ),
    srep AS (
        SELECT gram FROM sg GROUP BY gram
        HAVING COUNT(DISTINCT doc_id) >= {dp.REPEATED_SPAN_MIN_DOCS}
    ),
    shits AS (SELECT doc_id, pos FROM sg WHERE gram IN (SELECT gram FROM srep)),
    sflag AS (
        SELECT doc_id, pos,
               CASE WHEN LAG(pos) OVER win IS NULL
                         OR pos - LAG(pos) OVER win > {n}
                    THEN 1 ELSE 0 END AS brk
        FROM shits
        WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
    ),
    sspan AS (
        SELECT doc_id, pos,
               CAST(SUM(brk) OVER (
                   PARTITION BY doc_id ORDER BY pos
                   ROWS UNBOUNDED PRECEDING) AS INT) AS span_id
        FROM sflag
    ),
    smerged AS (
        SELECT doc_id, MIN(pos) AS sp_s, MAX(pos) + {n - 1} AS sp_e
        FROM sspan GROUP BY doc_id, span_id
    ),
    sagg AS (
        SELECT doc_id, list({{'s': sp_s, 'e': sp_e}}) AS spans
        FROM smerged GROUP BY doc_id
    ),
    clean AS MATERIALIZED (
        SELECT nd.doc_id, nd.source,
               CASE WHEN sagg.spans IS NULL THEN ndw.w
                    ELSE list_filter(ndw.w, (x, i) ->
                        NOT len(list_filter(sagg.spans,
                            sp -> i >= sp.s AND i <= sp.e)) > 0)
               END AS cw
        FROM nd
        JOIN ndw USING (doc_id)
        LEFT JOIN sagg USING (doc_id)
    ),
    mt AS (
        SELECT source, SUM(len(cw)) AS stratum_tokens FROM clean GROUP BY source
    ),
    keptm AS MATERIALIZED (
        SELECT clean.* FROM clean JOIN mt USING (source)
        WHERE (doc_id % {_CPE_MIX_BUCKETS}) * stratum_tokens
              < ({budget_sql}) * {_CPE_MIX_BUCKETS}
    )"""
    d_body = "SELECT doc_id, source, list_filter(cw, x -> x <> '') AS ws FROM keptm"
    return (
        _bpe_doc_ids_cte(prefix_ctes=pipeline, d_body=d_body)
        + f"""
    , c AS (
        SELECT source, doc_id, ids_str, n_ids,
               SUM(n_ids) OVER (PARTITION BY source ORDER BY doc_id) AS cum
        FROM per_doc
    ),
    acct AS (
        SELECT CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS n_input_docs,
               CAST((SELECT COUNT(*) FROM q) AS BIGINT) AS quality_kept,
               CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS exact_kept,
               CAST((SELECT COUNT(*) FROM nd) AS BIGINT) AS neardup_kept,
               CAST((SELECT COUNT(*) FROM keptm) AS BIGINT) AS mix_kept
    )
    SELECT source,
           CAST(FLOOR((cum - 1) / {SHARD_TOKENS}) AS INT) AS shard_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_ids) AS BIGINT) AS shard_tokens,
           md5(string_agg(ids_str, ' ' ORDER BY doc_id)) AS payload_md5,
           MAX(n_input_docs) AS n_input_docs,
           MAX(quality_kept) AS quality_kept,
           MAX(exact_kept) AS exact_kept,
           MAX(neardup_kept) AS neardup_kept,
           MAX(mix_kept) AS mix_kept
    FROM c CROSS JOIN acct
    GROUP BY source, shard_id
    ORDER BY source, shard_id
    """
    )


@register(
    "corpus_prep_e2e",
    oracle=_corpus_prep_oracle(),
    doc=(
        "End-to-end corpus preparation: quality gate -> exact dedup -> "
        "near-dup cluster keep-best -> repeated-span excision -> "
        "token-budget mix -> BPE shard packing, published as a "
        "versioned manifest with per-shard payload digests."
    ),
)
def corpus_prep_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-data pipeline, registered as one query so
    the driver verifies the stages COMPOSE, not just enumerate.

    Stage plan shapes (each individually green; provenance in the
    per-stage queries): quality gate is a codegen projection + filter;
    exact dedup is one partial-aggregating key shuffle
    (operators/dedup.py:exact_dedup); near-dup clustering is the
    df-capped shingle inverted index + distributed CC keep-best
    (ngram_jaccard_pairs / graph.duplicate_clusters); span excision is
    broadcast-free Column algebra over matching positions only
    (dedup.repeated_ngram_spans / decontam.excise_spans); the mix is
    exact integer keymod cross-multiplication
    (sampling.token_budget_mix); encoding is the Arrow-batched memoized
    BPE apply (operators/bpe.py); packing is the bucketed two-phase
    running sum (_packing_cum — |sources| × PACK_BUCKETS parallel, no
    whole-source task). The manifest rows carry stage accounting (docs in/kept per
    stage) plus an md5 of each shard's full id payload, and the final
    table is PUBLISHED via operators/manifest.py (atomic version-dir
    flip) and read back — what a downstream loader would read is what
    the oracle verifies."""
    import atexit
    import shutil
    import tempfile

    from etl_mudah_spark.operators import bpe
    from etl_mudah_spark.operators import decontam as dc
    from etl_mudah_spark.operators import dedup as dd
    from etl_mudah_spark.operators import graph as gr
    from etl_mudah_spark.operators import manifest as mfst
    from etl_mudah_spark.plans import datapipe as dp

    scratch = tempfile.mkdtemp(prefix="corpus_prep_")
    atexit.register(shutil.rmtree, scratch, ignore_errors=True)

    def stage(df: DataFrame, name: str) -> DataFrame:
        """Materialize a stage boundary: write the stage output, read
        it back. Production corpus pipelines persist between stages for
        restartability; here it ALSO keeps each Catalyst plan
        stage-sized — the fully-composed lazy tree re-expands the
        dedup/excision subplans at every downstream reference and its
        analysis cost grows superlinearly (measured: 570 s composed vs
        ~20 s staged at sf0.01 for identical results)."""
        path = f"{scratch}/{name}"
        df.write.parquet(path)
        return spark.read.parquet(path)

    docs = load(spark, sf_dir, "documents").select("doc_id", "source", "text")
    q = (
        tx.quality_features(docs, "text")
        .where(
            (F.col("n_tokens") >= CORPUS_MIN_TOKENS)
            & (F.col("type_token_ratio") >= CORPUS_MIN_TTR)
        )
        .select("doc_id", "source", "text", "n_tokens")
    )
    # `e` feeds three consumers (the pairs pipeline via CC's eager sym
    # checkpoint, the survivor-scoring join, the staged `nd` write) —
    # a lazy localCheckpoint boundary here (the §4/§5 round-14 pattern)
    # was A/B'd at the x10 staging (rotated, paired reps) and measured
    # PARITY: old min 18.66/med 25.15 vs ckpt 18.24/24.21, old winning
    # 4/6 paired reps — storing the text-carrying rows costs what the
    # two saved recomputes save. Left unckpointed; evidence in
    # OPTIMIZATION_r14.md and scripts/corpus_prep_ab_r14.py.
    e = dd.exact_dedup(
        q.withColumn("k", F.md5(F.substring("text", 1, 40))), ["k"], ["doc_id"]
    ).drop("k")
    pairs = dd.ngram_jaccard_pairs(
        e,
        threshold=_CPE_NEARDUP_THRESHOLD,
        max_shingle_df=dp._NGRAM_MAX_SHINGLE_DF,
    ).select("doc_a", "doc_b")
    clusters = gr.duplicate_clusters(pairs).select("node", "cluster_id")
    scored = clusters.join(
        e.select(F.col("doc_id").alias("node"), "n_tokens"), "node"
    )
    best = (
        scored.groupBy("cluster_id")
        .agg(
            F.min(
                F.struct((-F.col("n_tokens")).alias("_nt"), F.col("node"))
            ).alias("_m")
        )
        .select(F.col("_m.node").alias("node"))
    )
    losers = clusters.join(best, "node", "left_anti").select(
        F.col("node").alias("doc_id")
    )
    nd = stage(e.join(losers, "doc_id", "left_anti"), "deduped")
    spans = dd.repeated_ngram_spans(
        nd.select("doc_id", "text"),
        n=dp.REPEATED_SPAN_N,
        min_docs=dp.REPEATED_SPAN_MIN_DOCS,
    )
    ex = dc.excise_spans(nd.select("doc_id", "text"), spans)
    clean = nd.select("doc_id", "source").join(
        ex.select(
            "doc_id",
            "clean_text",
            F.col("n_tokens_after").cast("bigint").alias("n_tok"),
        ),
        "doc_id",
    )
    budget = F.when(
        F.substring("source", 4, 10).cast("int") % 2 == 0,
        F.lit(dp.TOKEN_BUDGET_EVEN),
    ).otherwise(F.lit(dp.TOKEN_BUDGET_ODD))
    mixed = smp.token_budget_mix(
        clean,
        key_col="doc_id",
        strata_col="source",
        tokens_col="n_tok",
        budget=budget,
        buckets=_CPE_MIX_BUCKETS,
    )
    kept = stage(
        mixed.where(F.col("_kept")).select("doc_id", "source", "clean_text"),
        "mixed",
    )
    enc = bpe.bpe_encode(kept, BPE_FIXTURE_MERGES, text_col="clean_text").select(
        "source",
        "doc_id",
        F.array_join("bpe_ids", " ").alias("ids_str"),
        F.size("bpe_ids").cast("bigint").alias("n_ids"),
    )
    cum = _packing_cum(sf_dir, enc, "n_ids")
    packed = cum.withColumn(
        "shard_id", F.floor((F.col("cum") - 1) / SHARD_TOKENS).cast("int")
    )
    payload = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("doc_id", "ids_str"))),
            lambda s: s["ids_str"],
        ),
        " ",
    )
    manifest = packed.groupBy("source", "shard_id").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_ids").cast("bigint").alias("shard_tokens"),
        F.md5(payload).alias("payload_md5"),
    )
    acct = (
        docs.agg(F.count("*").cast("bigint").alias("n_input_docs"))
        .join(F.broadcast(q.agg(F.count("*").cast("bigint").alias("quality_kept"))))
        .join(F.broadcast(e.agg(F.count("*").cast("bigint").alias("exact_kept"))))
        .join(F.broadcast(nd.agg(F.count("*").cast("bigint").alias("neardup_kept"))))
        .join(F.broadcast(kept.agg(F.count("*").cast("bigint").alias("mix_kept"))))
    )
    out = manifest.crossJoin(F.broadcast(acct))
    publish_base = f"{scratch}/manifest"
    mfst.manifest_publish(publish_base, lambda d: out.write.parquet(d))
    return mfst.manifest_read(spark, publish_base).orderBy(
        "source", "shard_id"
    ).select(
        "source",
        "shard_id",
        "n_docs",
        "shard_tokens",
        "payload_md5",
        "n_input_docs",
        "quality_kept",
        "exact_kept",
        "neardup_kept",
        "mix_kept",
    )
