"""Mergeable distinct-count sketch (HyperLogLog) in pure Column algebra.

``COUNT(DISTINCT k)`` is the most shuffle-hostile aggregate there is:
every distinct key must physically reach one reducer, so at 100 TB a
per-group distinct over a high-cardinality key ships the whole key
column through the exchange. The HLL sketch replaces that with FIXED
``2^p`` integers of state per group — partial sketches built map-side,
merged by a plain ``max`` per register — at the cost of a documented
~``1.04/sqrt(2^p)`` relative error.

The whole sketch is deliberately expressible in both engines so the
DuckDB oracle reproduces it BIT-FOR-BIT:

- the value hash is a 31-bit xorshift-multiply avalanche (see
  ``hll_hash``): plain ``>>``/``xor``/``*``/``%`` bigint arithmetic
  whose products stay below ``2^58`` — no int64 overflow in Spark
  (which would wrap silently under non-ANSI semantics) and no
  OutOfRange error in DuckDB. No engine-specific hash function
  (xxhash64 has no DuckDB twin).
- the register value rho (leading-zero rank of the ``31-p``-bit
  suffix) is computed EXACTLY from the binary-string length:
  ``width - length(bin(w)) + 1`` — both engines have ``bin``; no
  float ``log2`` with its boundary ulp risk.
- every harmonic-sum term is ``2^-rho`` — an exact power of two, and
  a sum of at most ``2^p`` powers of two ``>= 2^-(width+1)`` fits the
  53-bit double mantissa with room to spare, so the sum is EXACT and
  therefore independent of aggregation order. The one estimator
  division at the end is a single deterministic IEEE op. No
  linear-counting small-range correction (it would need ``ln``, whose
  last-ulp behavior is libm-specific); the raw estimator's low-range
  bias is documented instead and visible in the registered query's
  side-by-side exact column.

Plan shape at 100 TB: one shuffle on (group, bucket) with map-side
``max`` partials — state per group is 2^p registers regardless of key
cardinality — then one tiny shuffle on group over <= 2^p rows/group.
Contrast ``exact``: one shuffle of EVERY distinct (group, key) pair.

Registers are a first-class DataFrame (``hll_registers``), so sketches
persist, ship, and merge across days/sources (``hll_merge_registers``:
union + max — associative, commutative, idempotent) before a final
``hll_estimate_from_registers`` — the same incremental-index discipline
as the MinHash and SRP band tables (operators/dedup.py, similarity.py).

Reference analog: none (the reference's pandas ``nunique`` is exact and
single-node); this is SURVEY.md §7.4 scale engineering.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 31-bit xorshift-multiply finalizer (degski/splitmix32 family):
# x ^= x>>16; x = (x * A) mod 2^31 — twice — then a final x ^= x>>16.
# An LCG does NOT work here: HLL reads the hash's LEADING zeros, and an
# LCG's high bits of sequential keys are arithmetic progressions, which
# skews max-rho registers by 30-70% (measured before this mixer landed).
# The xorshift-multiply avalanche fixes that while staying exact in
# both engines: x < 2^31 and A < 2^27 keep every product below 2^58 —
# no int64 wrap in Spark, no OutOfRange in DuckDB — and the mod-2^31
# wrap IS the low-bits truncation the finalizer wants.
HLL_M = 1 << 31
HLL_MULT = 0x45D9F3B  # 73_244_475
_DEFAULT_P = 8


def _alpha(m: int) -> float:
    """HLL bias-correction constant (Flajolet et al. 2007)."""
    return {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))


def hll_hash(key: Column) -> Column:
    """Avalanching 31-bit mix of an integer key -> [0, 2^31).

    Exactly reproducible in DuckDB SQL:
    ``x = key % 2147483648; x = (xor(x>>16, x) * 73244475) % 2147483648``
    (twice), then ``xor(x>>16, x)``.
    """
    x = F.pmod(key.cast("bigint"), F.lit(HLL_M))
    for _ in range(2):
        x = F.pmod(
            F.shiftright(x, 16).bitwiseXOR(x) * HLL_MULT, F.lit(HLL_M)
        )
    return F.shiftright(x, 16).bitwiseXOR(x)


def _rho(w: Column, width: int) -> Column:
    """1-based leading-zero rank of ``w`` within ``width`` bits, exact:
    msb position is the length of the binary string (no float log2)."""
    return F.when(w == 0, F.lit(width + 1)).otherwise(
        F.lit(width) - F.length(F.bin(w)) + 1
    )


def hll_registers(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    p: int = _DEFAULT_P,
) -> DataFrame:
    """The sketch STATE: max rho per (group, bucket) — at most ``2^p``
    rows per group whatever the key cardinality. Map-side partial
    ``max`` makes the one shuffle carry only combined registers.

    Columns: group_cols..., bucket int, rho int.
    """
    m = 1 << p
    width = 31 - p
    h = hll_hash(F.col(value_col))
    gb = [F.col(c) for c in group_cols]
    return (
        df.select(*gb, h.alias("_h"))
        .select(
            *gb,
            F.pmod(F.col("_h"), F.lit(m)).cast("int").alias("bucket"),
            F.expr(f"_h DIV {m}").alias("_w"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max(_rho(F.col("_w"), width)).cast("int").alias("rho"))
    )


def hll_merge_registers(a: DataFrame, b: DataFrame, group_cols: Sequence[str]) -> DataFrame:
    """Merge two sketches: union + max per register. Associative,
    commutative, idempotent — merging a sketch with itself, or
    re-merging yesterday's persisted registers with today's batch,
    gives exactly the sketch of the union (pinned in tests)."""
    return (
        a.unionByName(b)
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate_from_registers(
    registers: DataFrame,
    group_cols: Sequence[str],
    p: int = _DEFAULT_P,
    out_col: str = "hll_distinct",
) -> DataFrame:
    """Raw HLL estimate per group from a register table.

    ``alpha * m^2 / (sum_present(2^-rho) + (m - buckets_hit))`` —
    absent buckets contribute ``2^-0 = 1`` each. Every term is a power
    of two, so the sum is exact and aggregation-order-independent; the
    final division is one deterministic IEEE op, rounded to 4dp.
    """
    m = 1 << p
    return registers.groupBy(*group_cols).agg(
        F.round(
            F.lit(_alpha(m) * m * m)
            / (
                F.sum(F.pow(F.lit(2.0), -F.col("rho")))
                + (F.lit(m) - F.count("*"))
            ),
            4,
        ).alias(out_col),
        F.count("*").cast("int").alias("buckets_hit"),
    )


def hll_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    p: int = _DEFAULT_P,
) -> DataFrame:
    """One-shot sketch distinct per group: registers -> estimate."""
    return hll_estimate_from_registers(
        hll_registers(df, group_cols, value_col, p), group_cols, p
    )


# ---------------------------------------------------------------------------
# Count-Min sketch (frequency estimation / heavy hitters)
# ---------------------------------------------------------------------------
# d independent hash rows come from XORing the key with a fixed seed
# before the same 31-bit avalanche — xor and the mixer are exact in
# both engines, so unlike HLL's float estimator the WHOLE CMS path is
# integer arithmetic: counters are sums, the estimate is a MIN, and
# cross-engine agreement is exact by construction.
#
# Relationship to plans/llmprep.py vocab_cms_topk: that query inlines a
# CMS over STRING terms via xxhash64 (no DuckDB twin, so its oracle is
# invariant-shaped — exact counts + contract booleans). This module is
# the reusable artifact API — persistable counter tables, the linear
# union-SUM merge, point estimation — for INTEGER keys, where the
# shared mixer makes even the estimates oracle-hash-exact. String keys
# at 100 TB: pre-hash to bigint (accepting xxhash64's rows-only
# oracle) or keep the inline form.
CMS_SEEDS = (0, 0x517C_C1B7, 0x2545_F491, 0x1966_0D4D,
             0x68E3_1DA4, 0x0B49_2B79, 0x7FEB_352D)
_CMS_WIDTH = 1 << 11
_CMS_DEPTH = 4



def _cms_cells(key: Column, width: int, depth: int) -> Column:
    """The exploded (row, col) counter cells of ``key`` — the ONE
    definition of the cell derivation, shared by build and probe (a
    drift between the two would silently probe the wrong cells)."""
    if not 1 <= depth <= len(CMS_SEEDS):
        raise ValueError(f"depth must be in [1, {len(CMS_SEEDS)}], got {depth}")
    return F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("row"),
                    F.pmod(
                        hll_hash(key.bitwiseXOR(F.lit(seed))),
                        F.lit(width),
                    )
                    .cast("int")
                    .alias("col"),
                )
                for i, seed in enumerate(CMS_SEEDS[:depth])
            ]
        )
    )


def cms_counters(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    width: int = _CMS_WIDTH,
    depth: int = _CMS_DEPTH,
) -> DataFrame:
    """The sketch STATE: occurrence counts per (group, row, col) —
    at most ``depth × width`` rows per group whatever the key
    cardinality (the fixed-size substitute for a full per-key count
    when the key space is open-ended: URLs, user ids, shingles).
    Columns: group_cols..., row int, col int, cnt bigint. One shuffle
    on (group, row, col) with map-side partial sums; the input is
    widened ``depth×`` BEFORE the shuffle but collapses to the bounded
    counter table inside the partial aggregate."""
    gb = [F.col(c) for c in group_cols]
    rowcols = _cms_cells(F.col(value_col), width, depth).alias("_rc")
    return (
        df.select(*gb, rowcols)
        .groupBy(*group_cols, F.col("_rc.row").alias("row"), F.col("_rc.col").alias("col"))
        .agg(F.count("*").alias("cnt"))
    )


def cms_merge_counters(
    a: DataFrame, b: DataFrame, group_cols: Sequence[str]
) -> DataFrame:
    """Merge two sketches: union + SUM per counter (associative and
    commutative — the linear-sketch property that lets daily partial
    sketches roll up into monthly ones; NOT idempotent, as befits a
    frequency counter)."""
    return (
        a.unionByName(b)
        .groupBy(*group_cols, "row", "col")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(
    counters: DataFrame,
    keys: DataFrame,
    group_cols: Sequence[str],
    key_col: str,
    width: int = _CMS_WIDTH,
    depth: int = _CMS_DEPTH,
    out_col: str = "cms_count",
) -> DataFrame:
    """Point-estimate the frequency of every row of ``keys`` (columns:
    group_cols... + key_col): MIN over the d rows of the counter each
    hash lands in. Guaranteed >= the true count (never an undercount);
    over by at most ~2n/width with probability 1 − 2^-depth. The probe
    re-derives the same (row, col) cells and joins the counter table —
    integer MIN, so the estimate is exactly reproducible anywhere the
    mixer is."""
    gb = [F.col(c) for c in group_cols]
    rowcols = _cms_cells(F.col(key_col), width, depth).alias("_rc")
    probes = keys.select(
        *gb,
        F.col(key_col),
        rowcols,
    ).select(
        *group_cols, key_col,
        F.col("_rc.row").alias("row"),
        F.col("_rc.col").alias("col"),
    )
    # inner join: a key that was sketched always finds its own cells
    # (its own occurrences put them there); an unsketched key would
    # need a left join + coalesce(0) — callers probing foreign keys
    # should pre-filter or accept the inner-join drop.
    return (
        probes.join(counters, [*group_cols, "row", "col"])
        .groupBy(*group_cols, key_col)
        .agg(F.min("cnt").alias(out_col))
    )


# ---------------------------------------------------------------------------
# Fixed-bin histogram sketch: mergeable quantiles
# ---------------------------------------------------------------------------
#
# The third mergeable summary next to HLL (distinct) and CMS
# (frequency): a fixed-boundary histogram whose counts add under union,
# answering quantile queries with a certified error bound of one bin
# WIDTH. Unlike t-digest/KLL (whose centroids depend on merge order and
# are not bit-reproducible across engines), fixed bins make the sketch
# integer-exact: build it per day/partition/stream-batch, SUM the
# counts to any coarser grain, interpolate — every number is
# count-ratio arithmetic any engine reproduces exactly, which is why
# the registered rollup query hash-matches its DuckDB oracle instead
# of needing an invariant band. The trade is a data-independent value
# range (lo, width, n_bins) chosen up front — the same fixed-edge
# discipline the drift operators use, for the same determinism reason.


def histogram_counters(
    df: DataFrame,
    value_col: str,
    lo: float,
    width: float,
    n_bins: int,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Build the sketch: ``(group_cols..., bin, cnt)`` — one map-side-
    combined aggregation; out-of-range values clamp into the edge bins
    (mass is never dropped), NULLs are excluded. Merge = union the
    counter tables and SUM cnt by (group, bin); no special merge
    function is needed because addition is the merge."""
    from etl_mudah_spark.operators.drift import fixed_bin

    v = F.col(value_col)
    return (
        df.where(v.isNotNull())
        .groupBy(*group_cols, fixed_bin(v, lo, width, n_bins).alias("bin"))
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )


def histogram_quantiles(
    counters: DataFrame,
    lo: float,
    width: float,
    quantiles: Sequence[tuple[int, int]],
) -> DataFrame:
    """Answer quantiles from a (merged) sketch: 1 row with
    ``n`` and one ``est_<num>_<den>`` per requested quantile.

    The estimate is linear interpolation inside the first bin whose
    cumulative count reaches the target rank t = num·N/den:
    ``lo + width·bin + width·(num·N − den·cum_below)/(den·cnt_bin)``
    — bin selection is integer arithmetic (den·cum ≥ num·N, no float
    rank), the within-bin position is one division of exact bigints,
    so the estimate is engine-identical. Guarantee: the true quantile
    lies in the same bin, so |est − exact| < width always.

    The cumulative window runs over the ≤ n_bins counter rows, never
    data; the totals fold in as a 1-row broadcast.

    Input contract: ``counters`` is a MERGED (ungrouped) sketch — one
    row per bin. A grouped counter table (histogram_counters with
    group_cols) holds duplicate bin rows whose interleaving under the
    global cumsum would silently corrupt the estimates, so this
    function first merges by bin (SUM is the sketch's merge operator);
    callers wanting per-group quantiles must filter to one group
    before calling.
    """
    from pyspark.sql import Window

    merged = counters.groupBy("bin").agg(
        F.sum("cnt").cast("bigint").alias("cnt")
    )
    wcum = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = merged.select(
        "bin", "cnt", F.sum("cnt").over(wcum).cast("bigint").alias("cum")
    )
    tot = counters.agg(F.sum("cnt").cast("bigint").alias("n"))
    j = cum.join(F.broadcast(tot))
    hits = []
    for num, den in quantiles:
        if not 0 < num <= den:
            raise ValueError(f"quantile {num}/{den} outside (0, 1]")
        hits.append(
            F.min(
                F.when(
                    F.col("cum") * den >= F.col("n") * num,
                    F.struct("bin", "cum", "cnt"),
                )
            ).alias(f"_h_{num}_{den}")
        )
    one = j.groupBy("n").agg(*hits)
    ests = []
    for num, den in quantiles:
        h = f"_h_{num}_{den}"
        ests.append(
            (
                F.lit(lo)
                + F.lit(width) * F.col(f"{h}.bin")
                + F.lit(width)
                * (
                    (
                        F.col("n") * num
                        - (F.col(f"{h}.cum") - F.col(f"{h}.cnt")) * den
                    )
                    * 1.0
                    / (F.col(f"{h}.cnt") * den)
                )
            ).alias(f"est_{num}_{den}")
        )
    return one.select("n", *ests)
