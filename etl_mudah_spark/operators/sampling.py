"""Deterministic sampling / domain-mixing operators.

Training-data pipelines re-weight sources ("domain mixing": up/down-
sample web vs books vs code to target proportions) and need the result
to be REPRODUCIBLE across runs and unchanged for old rows when the
corpus grows. Both operators here are pure functions of a stable key —
no RNG, no seed bookkeeping — the same discipline as
``plans/llmprep.py``'s ``doc_train_split``.

Two physical strategies, chosen by what must be exact:

- :func:`keymod_sample` — keep a row iff ``key % buckets`` falls under
  the stratum's weight. Map-only (ZERO shuffle): at 100 TB this is the
  only shape that survives, because it needs no per-stratum counts. The
  kept fraction is approximate (exact as corpus -> inf, and exactly
  reproducible row-by-row).
- :func:`stratified_topn` — exact N per stratum via row_number. Costs
  one shuffle on the stratum key and serializes each stratum through
  one task, so it is for strata that fit a task (dashboards, eval
  slices), not whole-corpus mixing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def keymod_flag(
    key_col: str,
    weight: Column,
    buckets: int = 100,
) -> Column:
    """Boolean Column: ``key % buckets < round(weight * buckets)``.

    ``weight`` is a per-row Column in [0, 1] (typically a CASE over the
    stratum column encoding target mix proportions). Exposed separately
    from :func:`keymod_sample` so one-scan conditional aggregations
    (kept vs total in the same pass) can reuse the exact sampling rule.
    """
    thresh = F.round(weight * buckets).cast("bigint")
    return F.pmod(F.col(key_col), F.lit(buckets)) < thresh


def keymod_sample(
    df: DataFrame,
    key_col: str,
    weight: Column,
    buckets: int = 100,
) -> DataFrame:
    """Deterministic weighted sample: keep iff
    ``key % buckets < round(weight * buckets)``.

    Rows with weight 1.0 are always kept; 0.0 never. Pure
    projection+filter — pushes to the scan, no exchange anywhere.
    """
    return df.where(keymod_flag(key_col, weight, buckets))


# One multiplicative-congruential step (glibc rand constants). Chosen
# over engine hashes (xxhash64, murmur) because the SAME bigint
# arithmetic is evaluable verbatim by any ANSI-SQL oracle — the
# portability requirement of the hash-compare correctness gate. Keys
# up to ~8.3e9 stay below bigint overflow at the multiply.
LCG_A = 1_103_515_245
LCG_C = 12_345
LCG_M = 2_147_483_648


def lcg_uniform(key: Column) -> Column:
    """Deterministic pseudo-uniform in (0, 1) from a non-negative
    integer key: ``((key·A + C) mod M + 1) / (M + 1)``. Never exactly
    0 or 1, so ``ln(u)`` is finite — the property
    :func:`weighted_sample_topn` needs."""
    mixed = F.pmod(key.cast("bigint") * LCG_A + LCG_C, F.lit(LCG_M))
    return (mixed + 1) / F.lit(float(LCG_M + 1))


def weighted_sample_topn(
    df: DataFrame,
    key_col: str,
    weight: Column,
    n: int,
    key_out: str = "sample_key",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, derandomized:
    Efraimidis–Spirakis A-ES (IPL 2006) with the uniform draw replaced
    by :func:`lcg_uniform` of the row key. Each row scores
    ``ln(u) / w`` and the top ``n`` scores win — inclusion probability
    proportional to weight, exactly reproducible across runs and
    engines, and stable for old rows when the corpus grows (same
    no-RNG discipline as :func:`keymod_sample`, which cannot express
    per-row CONTINUOUS weights; this can).

    Plan shape: map-only scoring + TakeOrdered — no global sort, no
    shuffle; at 100 TB each partition ships only its local top-``n``
    to the driver-side merge, the same physics as any top-k.
    ``weight`` must be strictly positive (caller-guarded).
    """
    score = F.log(lcg_uniform(F.col(key_col))) / weight
    return (
        df.withColumn(key_out, score)
        .orderBy(F.desc(key_out), F.asc(key_col))
        .limit(n)
    )


def bucketed_global_rank(
    df: DataFrame,
    bucket: Column,
    order_cols: list[str],
    rn_col: str = "rn",
) -> DataFrame:
    """Global 1-based ``row_number() OVER (ORDER BY order_cols)`` —
    WITHOUT a single-task window and WITHOUT a driver collect.

    ``bucket`` must be a NON-NULL, order-preserving coarsening of the
    leading order column (rows in a lower bucket always order before
    rows in a higher one — e.g. ``floor(value)`` for a numeric sort
    key, or an md5 hex prefix for a hash order). A NULL bucket would
    silently drop its rows at the equi-join below — callers must
    coalesce nulls into a real bucket first.

    Plan shape (two exchanges over the big table, both parallel):

    1. per-bucket counts — one hash-partitioned aggregation, output is
       #buckets rows;
    2. running-sum window over those counts, ordered by bucket. This IS
       a single-partition window, but over the aggregated relation
       (bounded by the bucket-domain size, e.g. <= 16^2 md5 prefixes or
       ~11k floor(acctbal) degrees), never over the data;
    3. per-bucket row_number (hash-partitioned window) + broadcast-join
       of the offsets back onto the rows.

    Everything is one lazy plan — no ``collect()``, so there is no
    two-job window for a non-deterministic source to corrupt positions
    (the plan executes the scan once per action like any other query).
    """
    keyed = df.withColumn("_bk", bucket)
    counts = keyed.groupBy("_bk").agg(F.count("*").alias("_cnt"))
    wcum = (
        Window.orderBy("_bk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = counts.select(
        "_bk", F.coalesce(F.sum("_cnt").over(wcum), F.lit(0)).alias("_off")
    )
    w = Window.partitionBy("_bk").orderBy(*order_cols)
    return (
        keyed.join(F.broadcast(offs), "_bk")
        .withColumn(rn_col, F.row_number().over(w) + F.col("_off"))
        .drop("_bk", "_off")
    )


def bucketed_running_sum(
    df: DataFrame,
    bucket: Column,
    order_cols: list[Column],
    val: Column,
    sum_col: str = "cum",
) -> DataFrame:
    """Global running ``SUM(val) OVER (ORDER BY order_cols ROWS
    UNBOUNDED PRECEDING)`` — without a single-task window.

    Same two-level trick as :func:`bucketed_global_rank`, accumulating
    a value instead of a count: per-bucket totals, a cumsum window over
    the (small) totals relation for bucket offsets, and a parallel
    per-bucket running sum. ``bucket`` must be NON-NULL and
    order-ALIGNED with ``order_cols`` (rows in a lower bucket always
    order first — e.g. ``-floor(value/K)`` for a descending value
    order). Exactness: pass a DECIMAL ``val`` and every partial stays
    decimal — offsets and in-bucket sums add without float error.
    """
    keyed = df.withColumn("_bk", bucket).withColumn("_val", val)
    totals = keyed.groupBy("_bk").agg(F.sum("_val").alias("_tot"))
    wcum = Window.orderBy("_bk").rowsBetween(Window.unboundedPreceding, -1)
    offs = totals.select(
        "_bk",
        F.coalesce(
            F.sum("_tot").over(wcum), F.lit(0).cast("decimal(38,6)")
        ).alias("_off"),
    )
    w = (
        Window.partitionBy("_bk")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        keyed.join(F.broadcast(offs), "_bk")
        .withColumn(sum_col, F.sum("_val").over(w) + F.col("_off"))
        .drop("_bk", "_off", "_val")
    )


def grouped_bucketed_running_sum(
    df: DataFrame,
    group_cols: list[str],
    bucket: Column,
    order_cols: list[Column],
    val: Column,
    sum_col: str = "cum",
    bucket_col: str = "_pkb",
) -> DataFrame:
    """Per-group running ``SUM(val) OVER (PARTITION BY group_cols ORDER
    BY order_cols)`` — without streaming any whole group through one
    task (VERDICT r10 item 2, the shard-packing scale seam).

    A plain ``Window.partitionBy(group).orderBy(order)`` gives one task
    per group: fine for thousands of groups, a serialization wall when
    a handful of sources each hold terabytes. This is
    :func:`bucketed_running_sum` with the group key threaded through
    every level: per-(group, bucket) totals, a cumsum window over the
    totals relation partitioned by group (bounded: |groups| × |bucket
    domain| rows, never data-sized), and a parallel per-(group, bucket)
    running sum. Parallelism becomes |groups| × |buckets| tasks.

    ``bucket`` must be NON-NULL and order-aligned with ``order_cols``
    within each group (e.g. ``floor(id / B)`` for an ascending id
    order), and ``order_cols`` must UNIQUELY key rows within each
    (group, bucket): the running sum uses an explicit ROWS frame, so
    on ties it diverges from the default RANGE frame of a plain
    ``SUM() OVER (ORDER BY ...)`` (RANGE gives every tied row the
    whole tie class's sum; ROWS gives each a distinct prefix in an
    arbitrary tie order — ADVICE r11). With unique keys the two frames
    coincide and the decomposition equals the one-window form row for
    row; with ties the ROWS semantics is pinned in
    tests/test_properties.py. NULL group keys are supported: the
    offsets join is null-safe, so a NULL group is its own partition
    exactly as ``PARTITION BY`` treats it. Exactness: integer/decimal
    ``val`` keeps every partial exact. ``bucket_col`` stays visible in
    the physical plan's window specs so audits can pin the bucketed
    shape; it is dropped from the result.
    """
    keyed = df.withColumn(bucket_col, bucket).withColumn("_val", val)
    totals = keyed.groupBy(*group_cols, bucket_col).agg(
        F.sum("_val").alias("_tot")
    )
    wcum = (
        Window.partitionBy(*group_cols)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = totals.select(
        *[F.col(c).alias(f"_og_{c}") for c in group_cols],
        F.col(bucket_col).alias("_og_bk"),
        F.coalesce(F.sum("_tot").over(wcum), F.lit(0)).alias("_off"),
    )
    # null-SAFE on the group keys (ADVICE r11): a plain equi-join drops
    # NULL-group rows, while the single-window form keeps NULL as its
    # own partition. The bucket is contract-NON-NULL, so plain equality
    # there.
    cond = F.col(bucket_col) == F.col("_og_bk")
    for c in group_cols:
        cond = cond & F.col(c).eqNullSafe(F.col(f"_og_{c}"))
    w = (
        Window.partitionBy(*group_cols, bucket_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        keyed.join(F.broadcast(offs), cond)
        .withColumn(sum_col, F.sum("_val").over(w) + F.col("_off"))
        .drop(bucket_col, "_og_bk", "_off", "_val",
              *[f"_og_{c}" for c in group_cols])
    )


def md5_global_order(
    df: DataFrame,
    key_col: str,
    rn_col: str = "rn",
    bucket_chars: int = 2,
) -> DataFrame:
    """Deterministic global shuffle order: 1-based position of every row
    under ``ORDER BY md5(key), key`` — WITHOUT a single-task global
    window.

    A naive ``row_number() OVER (ORDER BY ...)`` serializes the whole
    table through one task. Instead the md5 hex prefix partitions the
    order (lexicographic prefix property) and
    :func:`bucketed_global_rank` does the two-level rank: per-prefix
    counts, a cumsum window over the 16^bucket_chars count rows, and a
    parallel per-prefix ranking window. 100 TB spreads over
    16^bucket_chars ~independent sorts. This is the standard "shuffle
    the corpus reproducibly before sharding" step of a training-data
    pipeline: the order is a pure function of the stable key — no RNG
    state, stable under re-runs, and single-pass lazy (no collect), so
    it is safe even over a source that is not re-read-deterministic.

    NULL keys are ordered first (md5('') bucket, NULL tiebreak) rather
    than dropped — the key column should still be unique-non-null for
    the order to be meaningful.
    """
    ord_key = F.md5(F.coalesce(F.col(key_col).cast("string"), F.lit("")))
    keyed = df.withColumn("_ok", ord_key)
    return bucketed_global_rank(
        keyed, F.substring("_ok", 1, bucket_chars), ["_ok", key_col], rn_col
    ).drop("_ok")


def stratified_topn(
    df: DataFrame,
    strata_col: str,
    n: int,
    order_col: str,
) -> DataFrame:
    """Exactly the first ``n`` rows per stratum in ``order_col`` order.

    One shuffle on ``strata_col``; each stratum streams through a
    single task (use :func:`keymod_sample` for corpus-scale strata).
    """
    w = Window.partitionBy(strata_col).orderBy(order_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n)
        .drop("_rn")
    )


def stratified_topn_salted(
    df: DataFrame,
    strata_col: str,
    n: int,
    order_col: str,
    tiebreak_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Skew-safe :func:`stratified_topn`: exactly the first ``n`` rows
    per stratum in (``order_col``, ``tiebreak_col``) order, with no
    stratum ever confined to one task.

    Two phases, both exact: phase 1 ranks within (stratum, salt) —
    a hot stratum's rows spread over ``n_salts`` reducers, each
    keeping its local first ``n`` — then phase 2 ranks the at most
    ``n_salts·n`` survivors per stratum. The first ``n`` of a stratum
    are each first-``n`` within their salt bucket, so the composition
    loses nothing (pinned equal to the one-phase window in tests).
    The salt derives from ``tiebreak_col``, not ``rand()``, so task
    retries are exactly-once-safe; ``tiebreak_col`` must be unique per
    row for the order to be total (same contract as every
    deterministic-sampling operator here).

    Use with ``order_col = lcg_uniform(key)`` for a uniform
    k-per-stratum sample; with a quality score for per-stratum
    curation. One extra (cheap, ≤ n_salts·n rows/stratum) exchange
    buys the hot-stratum ceiling: phase-1 partitions are
    ``|stratum|/n_salts`` instead of ``|stratum|``.
    """
    w1 = Window.partitionBy(strata_col, "_salt").orderBy(
        order_col, tiebreak_col
    )
    w2 = Window.partitionBy(strata_col).orderBy(order_col, tiebreak_col)
    from etl_mudah_spark.operators.skew import salt_col

    return (
        df.withColumn("_salt", salt_col(tiebreak_col, n_salts))
        .withColumn("_rn1", F.row_number().over(w1))
        .where(F.col("_rn1") <= n)
        .withColumn("_rn", F.row_number().over(w2))
        .where(F.col("_rn") <= n)
        .drop("_salt", "_rn1", "_rn")
    )


def token_budget_mix(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    tokens_col: str,
    budget: Column,
    buckets: int = 1000,
) -> DataFrame:
    """Deterministically downsample each stratum to a TOKEN budget: the
    pretraining-mix primitive ("2T tokens of web, 300B of code") where
    targets are token counts, not row fractions.

    Adds boolean ``_kept``: a doc survives iff

        (key % buckets) * stratum_total_tokens < budget * buckets

    — the keymod rule with keep-rate budget/total expressed as one
    EXACT bigint cross-multiplication: no floating-point rate, no
    round(), so engines can't disagree at threshold boundaries, and
    re-runs on the same snapshot are bit-identical. Strata under
    budget keep everything (rate clamps at 1 since key % buckets <
    buckets always).

    Determinism vs growth: appending docs to OTHER strata never flips
    a kept key (its stratum total is untouched — pinned by the
    property tests), but appending to the SAME stratum raises its
    total and lowers the keep rate, so previously kept keys near the
    threshold drop out — the rule tracks the budget, it is not a
    frozen sample. To freeze a shipped mix, persist the
    ``_stratum_tokens`` snapshot and join that instead of
    re-aggregating.

    Rows whose ``strata_col`` is NULL have no meaningful total; they
    come back with ``_kept = false`` (row-preserving) rather than
    silently vanishing in the totals join.

    Plan: one narrow agg for per-stratum totals (tiny: |strata| rows,
    broadcast back), then a map-only flag — the corpus is scanned, never
    shuffled. ``budget`` is a per-row Column (CASE over the stratum) so
    mixes with different per-domain targets stay one pass.

    Overflow: (buckets-1) * total_tokens must fit int64 — fine through
    ~9e15 tokens at buckets=1000; pass smaller buckets at exa-scale.
    """
    totals = df.groupBy(strata_col).agg(
        F.sum(F.col(tokens_col)).cast("bigint").alias("_stratum_tokens")
    )
    # Left join: a NULL stratum matches no totals row (SQL NULL equi-
    # join semantics) — keep the row and flag it dropped instead of
    # losing it from the output frame.
    joined = df.join(F.broadcast(totals), strata_col, "left")
    kept = (
        F.pmod(F.col(key_col), F.lit(buckets)).cast("bigint")
        * F.col("_stratum_tokens")
    ) < (budget.cast("bigint") * F.lit(buckets))
    return joined.withColumn("_kept", F.coalesce(kept, F.lit(False)))


def rendezvous_assign(
    df: DataFrame,
    key_col: str,
    shards: list[tuple[str, int]],
    out_col: str = "shard",
) -> DataFrame:
    """Rendezvous (highest-random-weight) shard assignment [Thaler &
    Ravishankar '96] — the routing rule consistent pipelines want:
    each key goes to the shard whose ``mix(key XOR seed)`` weight is
    highest, so REMOVING a shard moves only that shard's keys (each
    surviving shard's weight for a key is unchanged — its winners stay
    put) and ADDING one steals only the keys it now wins: ~1/n of
    each, no ring to maintain, no resharding storm. ``shards`` is a
    list of (name, seed) with fixed integer seeds < 2^31 (the seed
    list IS the cluster topology artifact — persist it).

    Map-only Column algebra: per shard one 31-bit avalanche
    (operators/sketch.py hll_hash, the engine-shared mixer, so SQL
    oracles reproduce the routing exactly), argmax via array_max over
    (weight, name) structs — weight ties (p ≈ 2⁻³¹) break toward the
    lexicographically larger name. No shuffle, no UDF, no window.
    """
    if not shards:
        raise ValueError("shards must be non-empty")
    from etl_mudah_spark.operators.sketch import hll_hash

    key = F.col(key_col)
    winner = F.array_max(
        F.array(
            *[
                F.struct(
                    hll_hash(key.bitwiseXOR(F.lit(seed))).alias("w"),
                    F.lit(name).alias("name"),
                )
                for name, seed in shards
            ]
        )
    )
    return df.withColumn(out_col, winner["name"])
