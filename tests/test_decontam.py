"""Eval-set decontamination: planted-overlap oracle + broadcast plan
audit."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_mudah_spark.operators.decontam import ngram_decontaminate, ngram_set

EVAL = [
    (100, "the quick brown fox jumps over the lazy dog"),
    (101, "pack my box with five dozen liquor jugs"),
]
CORPUS = [
    # contains "the quick brown" and more of eval doc 100
    (0, "we saw the quick brown fox jumps high today"),
    # exactly one shared 3-gram ("five dozen liquor")
    (1, "she bought five dozen liquor bottles yesterday evening"),
    # no overlap
    (2, "completely unrelated words about spark query engines"),
    # repeats a shared gram twice — distinct shingles count it ONCE
    (3, "the quick brown cat and the quick brown dog"),
]


def _python_overlap(corpus_text: str, eval_texts: list[str], n: int = 3) -> int:
    def grams(t):
        w = t.split()
        return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}

    ev = set().union(*(grams(t) for t in eval_texts))
    return len(grams(corpus_text) & ev)


def test_overlap_counts_match_python_oracle(spark):
    ev = spark.createDataFrame(EVAL, "doc_id bigint, text string")
    corpus = spark.createDataFrame(CORPUS, "doc_id bigint, text string")
    out = {
        r["doc_id"]: r["n_shared"]
        for r in ngram_decontaminate(corpus, ngram_set(ev)).collect()
    }
    eval_texts = [t for _, t in EVAL]
    expected = {
        i: _python_overlap(t, eval_texts) for i, t in CORPUS
    }
    expected = {i: c for i, c in expected.items() if c > 0}
    assert out == expected
    assert 2 not in out  # clean doc absent
    assert out[3] == 1  # repeated gram counted once (distinct shingles)


def test_eval_gram_side_is_broadcast(spark):
    ev = spark.createDataFrame(EVAL, "doc_id bigint, text string")
    corpus = spark.createDataFrame(CORPUS, "doc_id bigint, text string")
    plan = (
        ngram_decontaminate(corpus, ngram_set(ev))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_shuffle_fallback_same_result(spark):
    ev = spark.createDataFrame(EVAL, "doc_id bigint, text string")
    corpus = spark.createDataFrame(CORPUS, "doc_id bigint, text string")
    b = ngram_decontaminate(corpus, ngram_set(ev), broadcast_grams=True)
    s = ngram_decontaminate(corpus, ngram_set(ev), broadcast_grams=False)
    assert sorted(map(tuple, b.collect())) == sorted(map(tuple, s.collect()))


def test_span_reporting_merges_overlapping_windows(spark):
    """Span semantics on a hand-built corpus: matched 3-gram windows
    merge when they overlap or touch (gap <= n positions) and split
    otherwise; boundaries are [first_pos, last_pos + n - 1]."""
    from etl_mudah_spark.operators.decontam import ngram_decontaminate_spans

    # eval doc contributes grams "a b c", "b c d", ..., "x y z"
    eval_df = spark.createDataFrame(
        [(0, "a b c d q q q x y z")], "doc_id int, text string"
    )
    corpus = spark.createDataFrame(
        [
            # "a b c" at pos 1 and "b c d" at pos 2 (overlap -> one
            # span, tokens 1..4); "x y z" at pos 9 (gap 7 > n=3 ->
            # second span, tokens 9..11)
            (1, "a b c d u u u u x y z"),
            (2, "no contamination here at all"),
        ],
        "doc_id int, text string",
    )
    grams = ngram_set(eval_df, "text", 3)
    rows = sorted(
        ngram_decontaminate_spans(corpus, grams, n=3).collect(),
        key=lambda r: (r["doc_id"], r["span_id"]),
    )
    got = [
        (r["doc_id"], r["span_id"], r["span_start"], r["span_end"], r["n_matched_grams"])
        for r in rows
    ]
    assert got == [(1, 1, 1, 4, 2), (1, 2, 9, 11, 1)]


def test_excise_spans_rebuilds_text_and_passes_through(spark):
    from etl_mudah_spark.operators.decontam import excise_spans

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "x y z")],
        "doc_id bigint, text string",
    )
    spans = spark.createDataFrame(
        [(1, 1, 2, 3), (1, 2, 6, 7)],  # cut tokens 2-3 and 6-7 of doc 1
        "doc_id bigint, span_id int, span_start int, span_end int",
    )
    out = {r["doc_id"]: r for r in excise_spans(docs, spans).collect()}
    assert out[1]["clean_text"] == "a d e h"
    assert (out[1]["n_tokens_before"], out[1]["n_tokens_after"]) == (8, 4)
    # doc 2 has no spans: untouched
    assert out[2]["clean_text"] == "x y z"
    assert (out[2]["n_tokens_before"], out[2]["n_tokens_after"]) == (3, 3)
