"""Skew-mitigation operators: salted aggregation and salted joins.

At 100 TB a handful of hot keys (boilerplate docs, bot user_ids, the
one mega-customer) can pin a single reducer for hours. Two standard
counters, both expressed as plain DataFrame algebra so Catalyst/AQE
still see through them:

- ``salted_agg``: two-phase aggregation — partial agg on
  (key, salt) spreads a hot key over ``n_salts`` reducers, final agg
  re-combines. Only associative aggregates survive this rewrite; the
  helpers here use exact decimal sums so the result is bit-identical
  to the unsalted plan.
- ``salted_join``: fact side gets a deterministic salt in [0, n);
  the (small) dim side is replicated n× with an explode, so the join
  key becomes (key, salt) and a hot key's rows land on n reducers.

Note AQE's skewedJoin handles *moderate* skew automatically
(spark.sql.adaptive.skewJoin.enabled, on in session.py) by splitting
oversized post-shuffle partitions; explicit salting remains the tool
when a SINGLE key exceeds what one task can hold (AQE cannot split
one key's hash bucket across tasks for aggregation).

Reference analog: none (single-node pandas never shuffles) — this is
pure scale engineering, SURVEY.md §7.4.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_col(deterministic_from: Column | str, n_salts: int) -> Column:
    """Deterministic salt in [0, n_salts) derived from a column hash.

    Deterministic (vs ``rand()``) so retried/recomputed tasks land rows
    in the same salt bucket — required for exactly-once semantics under
    task retry and for reproducible plans.
    """
    c = F.col(deterministic_from) if isinstance(deterministic_from, str) else deterministic_from
    return F.pmod(F.xxhash64(c), F.lit(n_salts)).cast("int")


def salted_sum_count(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    n_salts: int = 16,
    salt_from: str | None = None,
) -> DataFrame:
    """Two-phase skew-safe sum+count of ``value_col`` per ``group_cols``.

    Phase 1 aggregates on (group_cols…, salt) — the hot key's rows are
    spread over ``n_salts`` reducers; phase 2 combines the ≤ n_salts
    partials per key. Sums are exact DECIMAL(28,6) in phase 1 and only
    cast to double at the very end, so the result is bit-identical to a
    single-phase plan regardless of salt count or partitioning.

    Output: group_cols…, ``sum_value`` (double), ``cnt`` (bigint).
    """
    # Default the salt to a hash over the FULL row, not value_col: a hot
    # key whose values are constant/low-cardinality (the typical skew
    # case — and all NULLs hash identically) would land every row in one
    # salt bucket and silently defeat the mitigation. The result is
    # bit-identical either way (exact decimal partials commute).
    if salt_from is not None:
        salt = salt_col(salt_from, n_salts)
    else:
        salt = F.pmod(
            F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts)
        ).cast("int")
    dec = "decimal(28,6)"
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*group_cols, "_salt")
        .agg(
            F.sum(F.col(value_col).cast(dec)).alias("_psum"),
            F.count(value_col).alias("_pcnt"),
        )
    )
    return partial.groupBy(*group_cols).agg(
        F.sum("_psum").cast("double").alias("sum_value"),
        F.sum("_pcnt").alias("cnt"),
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the dim side replicated ``n_salts``× to defeat
    fact-side key skew.

    The fact side salts each row deterministically from its OWN full
    row hash (not the join key — that would put a hot key in one
    bucket again); the dim side explodes a [0, n) sequence so every
    (key, salt) pair exists. Join key becomes (key, salt): a hot fact
    key now spreads over ``n_salts`` reducers.

    Cost model: dim shuffle volume × n_salts — only worth it when
    ``dim`` is small relative to the hot key's row count and the join
    cannot broadcast (if it can, ``broadcast(dim)`` is strictly
    better; this exists for the mid-size-dim + pathological-skew
    regime).

    Only fact-preserving join types are accepted: the dim side is
    replicated n_salts×, so right/full outer joins would emit one
    null-extended row PER SALT for dim keys with no fact match.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} is not fact-preserving; the replicated "
            f"dim side would duplicate unmatched rows {sorted(allowed)}"
        )
    fact_s = fact.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(n_salts)).cast("int"),
    )
    dim_s = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>"))
    )
    out = fact_s.join(dim_s, on=[on, "_salt"], how=how)
    return out.drop("_salt")
