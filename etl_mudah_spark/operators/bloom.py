"""Distributed Bloom-filter semi-join reduction — prune a huge fact
table against a filtered dimension BEFORE any fact-side shuffle.

The 100 TB problem: ``fact ⋈ σ(dim)`` where the predicate keeps a few
percent of dim. A plain join shuffles ALL of fact on the join key;
broadcasting σ(dim) is often impossible (tens of GB of keys). Spark's
own answer is runtime row-level filtering (InjectRuntimeFilter /
``spark.sql.optimizer.runtime.bloomFilter.enabled``), but it only
fires under planner heuristics (creation-side size thresholds, shuffle
presence) and is invisible to the API. This module is the explicit,
composable version of the same idea:

- :func:`bloom_build` aggregates σ(dim)'s keys into an m-bit filter
  stored as a ``(word_idx, word)`` DataFrame of ``m/64`` rows — built
  with ONE shuffle of k·n tiny rows that map-side partial ``bit_or``
  collapses to at most #words per partition. The bitmap is data, so it
  can be persisted and reused like the MinHash/SRP band indexes.
- :func:`bloom_prune` filters the fact side with k successive
  BROADCAST hash joins against the word table (the bitmap is KBs —
  ``m = 2²⁰`` bits is 16 384 longs = 128 KB), each verifying one hash
  position. Zero fact-side shuffles, zero UDFs; every row does k
  hash-probe lookups in whole-stage codegen.
- A Bloom filter admits false positives, never false negatives, so
  the contract is: ``bloom_prune`` keeps a SUPERSET of matching rows;
  follow with the exact join — which now shuffles only survivors.
  With fpp ≈ (1 − e^{−kn/m})^k (1% at the defaults for n ≤ 10⁵ keys;
  size m ≈ 10·n bits for that target), the exact join's shuffle is
  ~selectivity·|fact|, the runtime-filter win, made explicit.

Hashing is ``xxhash64(key, seed_i)`` with fixed seeds — deterministic
across runs, retries, and engines.

Reference analog: none (the reference joins pandas frames in memory,
streamlit/utils/data_loader.py) — this is the scale path for the same
dim-filtered joins (SURVEY §2 J2) when the dim side outgrows a
broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Independent hash functions = one 64-bit xxhash per seed. Seeds are
# arbitrary fixed constants (same discipline as the MinHash family).
_BLOOM_SEEDS = (0x5EED_B100, 0x5EED_B101, 0x5EED_B102, 0x5EED_B103,
                0x5EED_B104, 0x5EED_B105, 0x5EED_B106)


def _positions(key: Column, n_bits: int, k: int) -> list[Column]:
    """The k bit positions of ``key`` in an ``n_bits``-wide filter."""
    if not 1 <= k <= len(_BLOOM_SEEDS):
        raise ValueError(f"k must be in [1, {len(_BLOOM_SEEDS)}], got {k}")
    return [
        F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(n_bits))
        for seed in _BLOOM_SEEDS[:k]
    ]


def bloom_build(
    df: DataFrame,
    key: str | Column,
    n_bits: int = 1 << 20,
    k: int = 3,
) -> DataFrame:
    """Aggregate ``df``'s keys into an ``n_bits`` Bloom filter as a
    ``(word_idx int, word bigint)`` DataFrame (≤ ``n_bits/64`` rows;
    absent word_idx ⇒ all-zero word). One shuffle of k rows per input
    row, collapsed map-side by the partial ``bit_or`` — no distinct
    pass needed (duplicate keys OR the same bits). Size for ~1% false
    positives: ``n_bits ≈ 10 × |keys|`` at k=3."""
    key = F.col(key) if isinstance(key, str) else key
    pos = F.explode(F.array(*_positions(key, n_bits, k))).alias("_pos")
    # shiftleft's Python signature takes a literal bit count; the SQL
    # form accepts a column operand, hence the expr.
    return (
        df.select(pos)
        .select(
            (F.col("_pos") / 64).cast("int").alias("word_idx"),
            F.expr("shiftleft(1L, CAST(_pos % 64 AS INT))").alias("_bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("_bit").alias("word"))
    )


def bloom_prune(
    df: DataFrame,
    key: str | Column,
    bloom: DataFrame,
    n_bits: int = 1 << 20,
    k: int = 3,
) -> DataFrame:
    """Keep the rows of ``df`` whose ``key`` is (probably) in the
    filter: a SUPERSET of the true members — no false negatives — so
    composing with the exact join afterwards is lossless while the
    exact join's shuffle carries only survivors.

    k broadcast hash joins against the word table, one per hash
    position; a row survives join i only if its bit is set, and a
    missing word row means an all-zero word ⇒ pruned (inner join).
    The fact side is never shuffled and never widened by more than two
    transient columns at a time."""
    key = F.col(key) if isinstance(key, str) else key
    out = df
    for i, pos in enumerate(_positions(key, n_bits, k)):
        w = F.broadcast(
            bloom.select(
                F.col("word_idx").alias(f"_bwi{i}"), F.col("word").alias(f"_bw{i}")
            )
        )
        out = (
            out.withColumn(f"_bp{i}", pos)
            .withColumn(f"_bwi{i}", (F.col(f"_bp{i}") / 64).cast("int"))
            .join(w, f"_bwi{i}")
            .where(
                F.expr(
                    f"shiftrightunsigned(_bw{i}, CAST(_bp{i} % 64 AS INT)) & 1"
                )
                == 1
            )
            .drop(f"_bp{i}", f"_bwi{i}", f"_bw{i}")
        )
    return out


def bloom_semi_join(
    fact: DataFrame,
    fact_key: str,
    dim: DataFrame,
    dim_key: str,
    n_bits: int = 1 << 20,
    k: int = 3,
) -> DataFrame:
    """EXACT semi-join of ``fact`` against ``dim`` with Bloom
    pre-pruning: build the filter from dim's keys, prune fact with k
    broadcast probes (no fact shuffle), then run the exact
    ``left_semi`` join on the ~selectivity·|fact| survivors. Returns
    fact rows whose key appears in dim — identical to
    ``fact.join(dim, on, "left_semi")``, shuffling a fraction of the
    bytes when the dim predicate is selective."""
    bloom = bloom_build(dim.select(dim_key), dim_key, n_bits, k)
    pruned = bloom_prune(fact, fact_key, bloom, n_bits, k)
    # no distinct on the dim side: left_semi already emits each fact
    # row at most once, and a distinct would add a dim-wide shuffle —
    # the very cost this operator exists to avoid.
    return pruned.join(
        dim.select(F.col(dim_key).alias("_dk")),
        pruned[fact_key] == F.col("_dk"),
        "left_semi",
    )
