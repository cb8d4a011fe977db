"""BPE tokenizer (operators/bpe.py): the textbook merge sequence on a
hand-checkable corpus, apply/train consistency, determinism, and the
registered query's invariant band."""

from __future__ import annotations

from etl_mudah_spark.operators import bpe


def test_bpe_train_learns_expected_merges_on_tiny_corpus(spark):
    # corpus: "low" x3, "lower" x1 — highest-count pair is (l, o) = 4,
    # then (lo, w) = 4, then "low" fuses with </w> (3) before the
    # "lower" tail pairs (1 each).
    df = spark.createDataFrame(
        [(0, "low low low lower")], "doc_id bigint, text string"
    )
    merges = bpe.bpe_train(df, n_merges=3, sample_mod=1)
    assert merges == [("l", "o"), ("lo", "w"), ("low", "</w>")]


def test_bpe_token_counts_match_manual_encoding(spark):
    df = spark.createDataFrame(
        [(0, "low low low lower")], "doc_id bigint, text string"
    )
    merges = bpe.bpe_train(df, n_merges=3, sample_mod=1)
    # under those 3 merges: "low" -> [low</w>] = 1 token;
    # "lower" -> [low, e, r, </w>] = 4 tokens; total 3*1 + 4 = 7
    out = bpe.bpe_token_counts(df, merges).collect()[0]
    assert out["n_bpe"] == 7
    # full training fuses everything: 1 token per word
    full = bpe.bpe_train(df, n_merges=50, sample_mod=1)
    assert bpe.bpe_token_counts(df, full).collect()[0]["n_bpe"] == 4


def test_bpe_train_is_deterministic(spark):
    from etl_mudah_spark.tables import load
    from tests.conftest import SF_SMOKE

    docs = load(spark, SF_SMOKE, "documents")
    a = bpe.bpe_train(docs, n_merges=30)
    b = bpe.bpe_train(docs, n_merges=30)
    assert a == b and len(a) == 30


def test_registered_bpe_stats_band_is_nonvacuous(spark):
    """Every doc passes the band with the REAL count, and the
    whitespace-proxy count (fertility 1.0) would fail it — the band
    actually distinguishes subword from word counting."""
    from etl_mudah_spark.plans import registry
    from etl_mudah_spark.plans.llmprep import BPE_FERTILITY_LO
    from tests.conftest import SF_SMOKE

    rows = registry.REGISTRY["doc_bpe_token_stats"].spark_fn(
        spark, SF_SMOKE
    ).collect()
    assert rows and all(r["bpe_ok"] for r in rows)
    assert BPE_FERTILITY_LO > 1.0  # whitespace proxy would flip false


def test_bpe_merge_table_round_trips(spark, tmp_path):
    from etl_mudah_spark.tables import load
    from tests.conftest import SF_SMOKE

    docs = load(spark, SF_SMOKE, "documents")
    merges = bpe.bpe_train(docs, n_merges=30)
    path = str(tmp_path / "merges")
    bpe.bpe_save(spark, merges, path)
    assert bpe.bpe_load(spark, path) == merges
    # counts under the loaded artifact match counts under the in-memory
    # rules — the artifact IS the tokenizer
    a = bpe.bpe_token_counts(docs, merges).orderBy("doc_id").collect()
    b = bpe.bpe_token_counts(docs, bpe.bpe_load(spark, path)).orderBy("doc_id").collect()
    assert [r["n_bpe"] for r in a] == [r["n_bpe"] for r in b]


def test_bpe_encode_ids_consistent_with_counts(spark):
    """bpe_encode's sequence length must equal bpe_token_counts for
    every doc, its ids must decode through bpe_vocab (specials) or
    codepoints (chars), and empty docs must encode to []."""
    from pyspark.sql import functions as F

    from etl_mudah_spark.tables import load
    from tests.conftest import SF_SMOKE

    docs = load(spark, SF_SMOKE, "documents")
    merges = bpe.bpe_train(docs, n_merges=30)
    both = bpe.bpe_encode(bpe.bpe_token_counts(docs, merges), merges)
    bad = both.where(F.size("bpe_ids") != F.col("n_bpe")).count()
    assert bad == 0
    vocab_ids = set(bpe.bpe_vocab(merges).values())
    rows = both.select("bpe_ids").collect()
    assert any(r["bpe_ids"] for r in rows)
    for r in rows:
        for i in r["bpe_ids"]:
            assert i in vocab_ids or (0 <= i < bpe.SPECIAL_BASE), i

    empty = spark.createDataFrame(
        [(1, ""), (2, "   ")], "doc_id int, text string"
    )
    got = {
        r["doc_id"]: r["bpe_ids"]
        for r in bpe.bpe_encode(empty, merges).collect()
    }
    assert got == {1: [], 2: []}


def test_bpe_encode_exact_sequence_on_fixture():
    """Pin the apply semantics on the registered fixture: deep fusion
    ('table' -> one token), partial fusion, and codepoint fallback."""
    from etl_mudah_spark.plans.llmprep import BPE_FIXTURE_MERGES

    ranks = {p: i for i, p in enumerate(BPE_FIXTURE_MERGES)}
    vocab = bpe.bpe_vocab(BPE_FIXTURE_MERGES)
    ids = lambda w: [
        vocab.get(s) or ord(s) for s in bpe._encode_syms(w, ranks)
    ]
    B = bpe.SPECIAL_BASE
    assert ids("table") == [B + 5]              # tabl + e</w>, rank 4
    assert ids("scan") == [B + 13]              # scan</w>, rank 12
    assert ids("data") == [ord("d"), ord("a"), B + 2, B]  # d a ta </w>
    assert ids("zz") == [ord("z"), ord("z"), B]  # pure fallback
    # ADVICE r7: the id spaces must be disjoint for EVERY codepoint —
    # planes 15-16 (incl. private use) sit above the old 1_000_000
    # base. With SPECIAL_BASE = 0x110000, a plane-16 char keeps its
    # codepoint id and cannot alias </w> or any merged symbol.
    assert B > 0x10FFFF
    hi = "\U0010fffd"
    assert ids(hi) == [0x10FFFD, B]
    assert 0x10FFFD not in set(vocab.values())
