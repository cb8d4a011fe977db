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
