"""Eval-set decontamination: flag corpus documents that share word
n-grams with a benchmark/eval set.

The published pretraining recipe (GPT-3 appendix C / PaLM / Llama data
cards describe the same shape publicly): build the set of distinct
n-grams appearing in any eval document, then mark every training
document containing one. Production uses n=8..13; the synthetic
test corpus draws from a ~40-word vocabulary, so registered queries use
n=3 to produce a non-degenerate overlap signal — ``n`` is a parameter.

Scale design (100 TB corpus, MB-scale eval set):
- The eval n-gram set is tiny relative to the corpus (benchmarks are
  thousands of documents, not billions) → ``F.broadcast`` it. The
  corpus side then never shuffles: explode distinct n-grams per doc
  (map), broadcast-hash semi-join against the eval grams (map), and
  the only exchange is the final groupBy(doc_id) over the *matching*
  rows — contamination hits, a vanishing fraction of the corpus.
- Distinct-before-explode keeps the exploded width at one row per
  (doc, distinct gram), bounded by document length.
- For eval sets too large to broadcast, pass ``broadcast_grams=False``
  and the same plan degrades to a shuffle semi-join on the gram key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from etl_mudah_spark.operators.dedup import word_ngrams, word_shingles


def ngram_set(df: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """Distinct word n-grams over all rows of ``df`` (1 column: gram)."""
    return (
        df.select(F.explode(word_shingles(F.col(text_col), n)).alias("gram"))
        .distinct()
    )


def ngram_decontaminate(
    corpus: DataFrame,
    eval_grams: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    broadcast_grams: bool = True,
) -> DataFrame:
    """Contaminated corpus docs: ``(id_col, n_shared)`` for every doc
    sharing >= 1 n-gram with ``eval_grams`` (one ``gram`` column, e.g.
    from :func:`ngram_set`).

    ``n_shared`` counts the doc's *distinct* n-grams that appear in the
    eval set — the dedup-style overlap statistic a filter thresholds on.
    """
    grams = eval_grams.select("gram")
    if broadcast_grams:
        grams = F.broadcast(grams)
    exploded = corpus.select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), n)).alias("gram")
    )
    return (
        exploded.join(grams, "gram", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").cast("bigint").alias("n_shared"))
    )


def ngram_positions(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
) -> DataFrame:
    """Every word n-gram of every doc WITH its 1-based token position:
    ``(id_col, pos, gram)``. Map-only (posexplode of the in-order gram
    array) — position is what span reporting needs and what the
    set-based :func:`ngram_set` deliberately discards."""
    return df.select(
        F.col(id_col),
        F.posexplode(word_ngrams(F.col(text_col), n)).alias("pos0", "gram"),
    ).select(id_col, (F.col("pos0") + 1).alias("pos"), "gram")


def ngram_decontaminate_spans(
    corpus: DataFrame,
    eval_grams: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
    broadcast_grams: bool = True,
) -> DataFrame:
    """Span-level decontamination report: contiguous contaminated token
    ranges per corpus doc, one row per span —
    ``(id_col, span_id, span_start, span_end, n_matched_grams)``.

    Doc-level overlap counts (:func:`ngram_decontaminate`) tell you
    WHETHER a doc is contaminated; the published surgical remedy
    removes just the overlapping spans (plus margin) instead of the
    whole document, and that needs token ranges. A matched n-gram at
    position p covers tokens [p, p+n-1]; matches whose windows overlap
    or touch (gap <= n positions) merge into one span — the classic
    gaps-and-islands: break-flag via lag(pos), span_id via running sum.

    Scale: eval grams broadcast exactly as in the doc-level op; the
    gaps-and-islands window partitions by doc over the MATCHING
    positions only (contamination hits, a vanishing fraction of the
    corpus) — no unpartitioned window anywhere.
    """
    grams = eval_grams.select("gram")
    if broadcast_grams:
        grams = F.broadcast(grams)
    hits = ngram_positions(corpus, id_col, text_col, n).join(
        grams, "gram", "left_semi"
    )
    return positions_to_spans(hits, id_col=id_col, n=n)


def positions_to_spans(
    hits: DataFrame, id_col: str = "doc_id", n: int = 13
) -> DataFrame:
    """Merge matched n-gram positions ``(id_col, pos)`` into contiguous
    spans — the gaps-and-islands shared by span decontamination and
    intra-corpus repeated-span detection (dedup.repeated_ngram_spans).

    A match at position p covers tokens [p, p+n-1]; matches whose
    windows overlap or touch (gap <= n positions) merge. The window
    partitions by doc over MATCHING positions only — no unpartitioned
    window, and the per-doc row count is bounded by matches, not
    document length."""
    w = Window.partitionBy(id_col).orderBy("pos")
    prev = F.lag("pos").over(w)
    brk = F.when(prev.isNull() | (F.col("pos") - prev > n), 1).otherwise(0)
    spans = hits.withColumn("_brk", brk).withColumn(
        "span_id",
        F.sum("_brk").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("int"),
    )
    return (
        spans.groupBy(id_col, "span_id")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(n - 1)).alias("span_end"),
            F.count("*").cast("bigint").alias("n_matched_grams"),
        )
        .select(id_col, "span_id", "span_start", "span_end", "n_matched_grams")
    )


def excise_spans(
    docs: DataFrame,
    spans: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Surgically REMOVE reported token spans from each document — the
    scrub step that consumes :func:`ngram_decontaminate_spans` /
    ``dedup.repeated_ngram_spans`` output instead of dropping whole
    docs. Adds ``clean_text`` (the document with every
    [span_start, span_end] token range cut out) and ``n_tokens_before``
    / ``n_tokens_after``.

    All Column algebra, no UDF: spans collect per doc (bounded: spans
    per doc, not tokens) and join back on the doc key — left as a
    plain equi-join so AQE broadcasts when the span report is small
    and shuffles when it isn't (affected docs are usually a sliver of
    the corpus, but nothing guarantees broadcast-sized). Tokens keep
    their 1-based position via ``transform`` and survive iff no span
    covers them. Docs without spans pass through unchanged (null span
    list coalesces to empty).
    """
    sp = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans")
    )
    joined = docs.join(sp, id_col, "left")
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    indexed = F.transform(
        words, lambda w, i: F.struct(w.alias("w"), (i + 1).alias("i"))
    )
    filtered = F.filter(
        indexed,
        lambda s: ~F.exists(
            F.col("_spans"),
            lambda b: (s["i"] >= b["span_start"]) & (s["i"] <= b["span_end"]),
        ),
    )
    # no-span docs: _spans is NULL from the left join -> pass through
    kept = F.when(F.col("_spans").isNull(), indexed).otherwise(filtered)
    return joined.select(
        id_col,
        F.size(words).alias("n_tokens_before"),
        F.size(kept).alias("n_tokens_after"),
        F.array_join(F.transform(kept, lambda s: s["w"]), " ").alias("clean_text"),
    )
