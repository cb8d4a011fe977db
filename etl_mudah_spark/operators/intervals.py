"""Binned interval (range) join — the large×large time-overlap join.

The broadcast interval join (plans/temporal.py events_promo_range_join)
covers the small-dim case; when BOTH interval sets are large a
nested-loop is O(n·m) and a naive cross join is unrunnable. The
standard distributed strategy (what Databricks' range-join hints and
DuckDB's IEJoin replace): quantize time into fixed bins, replicate
each interval into every bin it touches, equi-join on the bin, then
re-check the exact overlap predicate. Work becomes
Σ_bins |L_b|·|R_b| — proportional to data density per bin, never to
|L|·|R|.

The classic hazard is double-counting: a pair whose overlap spans k
bins meets in k of them. The fix costs no extra pass — emit a pair
only in the ONE bin containing the overlap's start
(``bin == floor(max(start_l, start_r) / width)``); every surviving
pair is emitted exactly once, no post-join distinct.

Bin-width discipline at 100 TB: width ≈ the typical interval length.
Too narrow → long intervals replicate into many bins (fanout); too
wide → dense bins degrade toward per-bin nested loops. Both failure
modes are measurable (count rows per bin before the join); a skewed
hot bin (a flash-sale hour) can additionally be salted on the SMALLER
side. Intervals are half-open ``[start, end)``; epoch seconds are
truncated to whole seconds for binning only — coverage is computed to
err toward an extra bin (never a missed one) and the exact predicate
runs on the untruncated timestamps.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bins(start: Column, end: Column, width: int) -> Column:
    # floor-truncated epoch seconds; end bin intentionally covers the
    # truncated end even when it is exactly on a boundary (one harmless
    # extra bin beats a missed pair — see module docstring)
    lo = F.floor(start.cast("double").cast("long") / width)
    hi = F.floor(end.cast("double").cast("long") / width)
    return F.sequence(lo, hi)


def interval_join_binned(
    left: DataFrame,
    right: DataFrame,
    bin_seconds: int,
    l_start: str = "start",
    l_end: str = "end",
    r_start: str = "start",
    r_end: str = "end",
    extra_pred: Column | None = None,
    max_bin_size: int | None = None,
) -> DataFrame:
    """All (left, right) pairs whose ``[start, end)`` intervals
    overlap, via bin-replicate + equi-join + exact re-check. Columns
    from ``right`` come back suffixed ``_r`` (all of them; project
    before joining to keep the shuffle narrow). ``extra_pred`` (over
    the joined row) applies WITH the overlap predicate, before the
    dedupe emission — e.g. a self-join's ``id != id_r``.

    Timestamp or numeric interval columns both work (timestamps bin on
    epoch seconds; the exact predicate compares the original values).

    Contract: intervals must satisfy ``start <= end`` (half-open, so
    ``start == end`` is empty and matches nothing). An INVERTED
    interval would satisfy the standard overlap predicate spuriously
    (``[5,3)`` vs ``[0,10)``: 5<10 ∧ 0<3) — rather than silently
    dropping or silently matching such data errors, both sides are
    filtered with an explicit ``start <= end`` guard; count the
    complement upstream if inverted rows need surfacing.

    ``max_bin_size`` is the hot-bin guardrail (the analogue of the
    LSH bucket cap in operators/similarity.py and FUZZY_MAX_BLOCK):
    default ``None`` = exact. Per-bin pair work is |L_b|·|R_b|, so one
    pathologically dense bin (a flash-sale hour where every session
    overlaps) degrades the whole join toward n². With the cap set,
    each side of an oversized bin is keymod-sampled (deterministic
    xxhash64 over the interval's own columns — stable across runs and
    appends) down to ~max_bin_size rows BEFORE the equi-join, bounding
    per-bin work at ~cap². Sampling drops pairs (reported recall
    trade, never duplicates — the exactly-once rule is row-local) and
    is measurable up front via :func:`interval_bin_stats`.
    """
    left = left.where(F.col(l_start) <= F.col(l_end))
    right = right.where(F.col(r_start) <= F.col(r_end))
    lb = left.withColumn("_bin", F.explode(_bins(F.col(l_start), F.col(l_end), bin_seconds)))
    r_renamed = right.select([F.col(c).alias(f"{c}_r") for c in right.columns])
    rb = r_renamed.withColumn(
        "_bin",
        F.explode(_bins(F.col(f"{r_start}_r"), F.col(f"{r_end}_r"), bin_seconds)),
    )
    if max_bin_size is not None:
        lb = _cap_bins(lb, left.columns, max_bin_size)
        rb = _cap_bins(rb, r_renamed.columns, max_bin_size)
    ls, le = F.col(l_start), F.col(l_end)
    rs, re_ = F.col(f"{r_start}_r"), F.col(f"{r_end}_r")
    # max(start) < min(end), NOT the conjunctive (ls<re ∧ rs<le) form:
    # the two only agree for non-empty intervals — a zero-length
    # [x, x) passes the conjunctive test against any interval
    # containing x, but is empty and must match nothing
    overlap = F.greatest(ls, rs) < F.least(le, re_)
    # exactly-once emission: only the bin holding the overlap start
    first_bin = F.floor(
        F.greatest(ls, rs).cast("double").cast("long") / bin_seconds
    )
    joined = lb.join(rb, "_bin").where(overlap & (F.col("_bin") == first_bin))
    if extra_pred is not None:
        joined = joined.where(extra_pred)
    return joined.drop("_bin")


def _cap_bins(binned: DataFrame, cols: list[str], cap: int) -> DataFrame:
    """Keymod-sample oversized bins down to ~``cap`` rows each: a row
    in a bin of size s survives with probability ~cap/s via a
    deterministic hash of its own values — no RNG, so the kept set is
    stable across retries and incremental re-runs. One aggregate on
    the already-materialized bin column (map-side partials absorb the
    replication), one broadcast-friendly count join back."""
    sizes = binned.groupBy("_bin").agg(F.count("*").alias("_sz"))
    keep = (F.col("_sz") <= cap) | (
        F.pmod(F.xxhash64(F.struct(*cols)), F.col("_sz")) < F.lit(cap)
    )
    return binned.join(sizes, "_bin").where(keep).drop("_sz")


def interval_bin_stats(
    left: DataFrame,
    right: DataFrame,
    bin_seconds: int,
    l_start: str = "start",
    l_end: str = "end",
    r_start: str = "start",
    r_end: str = "end",
    max_bin_size: int | None = None,
) -> DataFrame:
    """Per-bin density report for :func:`interval_join_binned`:
    ``(bin, n_left, n_right, pair_work, capped)`` sorted by descending
    ``pair_work`` (= |L_b|·|R_b|, the join's per-bin cost BEFORE the
    exactly-once filter). Run it before committing a bin width: the
    top rows show whether the width is too wide (dense bins → per-bin
    quadratic work) and which wall-clock hot spots a ``max_bin_size``
    cap would sample. Aggregation-only — never materializes pairs."""
    lc = (
        left.select(F.explode(_bins(F.col(l_start), F.col(l_end), bin_seconds)).alias("_bin"))
        .groupBy("_bin")
        .agg(F.count("*").alias("n_left"))
    )
    rc = (
        right.select(F.explode(_bins(F.col(r_start), F.col(r_end), bin_seconds)).alias("_bin"))
        .groupBy("_bin")
        .agg(F.count("*").alias("n_right"))
    )
    out = (
        lc.join(rc, "_bin", "full_outer")
        .select(
            F.col("_bin").alias("bin"),
            F.coalesce("n_left", F.lit(0)).alias("n_left"),
            F.coalesce("n_right", F.lit(0)).alias("n_right"),
        )
        .withColumn("pair_work", F.col("n_left") * F.col("n_right"))
    )
    capped = (
        F.lit(False)
        if max_bin_size is None
        else (F.col("n_left") > max_bin_size) | (F.col("n_right") > max_bin_size)
    )
    return out.withColumn("capped", capped).orderBy(F.desc("pair_work"), "bin")


def interval_overlap_degree(
    intervals: DataFrame,
    bin_seconds: int,
    key_cols: list[str],
    start: str = "start",
    end: str = "end",
) -> DataFrame:
    """Per-interval concurrency degree: for each interval, how many
    OTHER intervals overlap it — the self-join special case of
    :func:`interval_join_binned` (``key_cols`` identify an interval;
    identical keys are excluded, so two distinct intervals that
    overlap count each other symmetrically). Returns the input keys +
    ``n_overlap``. Intervals whose degree is 0 are kept (left join
    back), because "nothing concurrent" is an answer."""
    clash = {start, end} & set(key_cols)
    if clash:
        raise ValueError(
            f"interval_overlap_degree: key_cols and start/end must be "
            f"distinct columns (clash: {sorted(clash)!r}) — add a "
            "separate id column (e.g. the start cast to long)"
        )
    not_self = None
    for k in key_cols:
        neq = F.col(k) != F.col(f"{k}_r")
        not_self = neq if not_self is None else (not_self | neq)
    pairs = interval_join_binned(
        intervals.select(*key_cols, start, end),
        intervals.select(*key_cols, start, end),
        bin_seconds,
        l_start=start,
        l_end=end,
        r_start=start,
        r_end=end,
        extra_pred=not_self,
    )
    deg = pairs.groupBy(*key_cols).agg(F.count("*").alias("n_overlap"))
    return (
        intervals.select(*key_cols)
        .join(deg, key_cols, "left")
        .withColumn("n_overlap", F.coalesce("n_overlap", F.lit(0)))
    )
