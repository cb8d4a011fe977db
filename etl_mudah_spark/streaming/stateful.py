"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState``.

The batch engine sessionizes with a lag window (plans/eventsq.py); this
is the true streaming form — per-user session state lives in the state
store, sessions close either when a later event exceeds the inactivity
gap or when the event-time watermark passes ``last_ts + gap``
(GroupStateTimeout.EventTimeTimeout).

Determinism harness: a file-source stream normally never fires the
final timeouts (the watermark stops at the last real batch), so open
sessions would stay unflushed and the result could not be compared to
the batch oracle. The driver function stages the events file plus TWO
far-future sentinel files with increasing mtimes and
``maxFilesPerTrigger=1``: batch 2 advances the watermark past every
real session's timeout, batch 3 fires them. Sentinel rows carry
``user_id = -1`` and are filtered from the output. Exactly the
end-of-stream-marker pattern used to drain production stateful jobs.

Scale: state is (start, last, n) longs per ACTIVE user — O(active
users), bounded by the timeout; the shuffle is one exchange on
user_id. Arrow moves rows to Python in columnar batches; the per-group
pandas work is O(rows log rows) for the in-batch sort.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from etl_mudah_spark.streaming.pipeline import (
    drain_to_parquet,
    events_raw_schema,
    restore_shuffle_width,
    normalize_ts,
)

OUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, n_events bigint"
)
STATE_SCHEMA = "start bigint, last bigint, n bigint"

_SENTINEL_USER = -1


def _us_to_ts(us: int) -> pd.Timestamp:
    return pd.Timestamp(us, unit="us")


def _make_sessionizer(gap_us: int):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]
        out: list[tuple[int, int, int, int]] = []  # (user, start, last, n)

        if state.hasTimedOut:
            start, last, n = state.get
            out.append((user_id, start, last, n))
            state.remove()
        else:
            rows = pd.concat(list(pdfs), ignore_index=True)
            # Force ns resolution before the epoch conversion — Arrow may
            # hand the column over as datetime64[us] depending on version.
            # Epochs stay in MICROseconds (the data's native precision;
            # milliseconds would truncate session boundaries).
            ts_us = (
                rows["ts"].astype("datetime64[ns]").astype("int64") // 1_000
            ).sort_values()
            if state.exists:
                start, last, n = state.get
            else:
                start = last = int(ts_us.iloc[0])
                n = 0
            for t in ts_us:
                t = int(t)
                if n and t - last > gap_us:
                    out.append((user_id, start, last, n))
                    start, n = t, 0
                # An admitted cross-batch straggler can have t < last
                # (the 0 s watermark only drops events older than the
                # previous batch's max): count it into the current
                # session but never move `last` backwards — a receding
                # session end would mis-split later gaps.
                last = max(last, t)
                n += 1
            state.update((start, last, n))
            # Flush the open session once event time passes last + gap
            # (the timeout API takes epoch ms; round up so the ms-granular
            # timeout never fires before the µs-exact gap has elapsed).
            state.setTimeoutTimestamp((last + gap_us) // 1000 + 1)

        if out:
            yield pd.DataFrame(
                {
                    "user_id": [u for u, *_ in out],
                    "session_start": [_us_to_ts(s) for _, s, _, _ in out],
                    "session_end": [_us_to_ts(e) for _, _, e, _ in out],
                    "n_events": [n for *_, n in out],
                }
            )

    return fn


def _stage_with_sentinels(
    spark: SparkSession, sf_dir: str, staging: str, ddl: str, ts_dtype: str
) -> None:
    """Copy events.parquet into ``staging`` and append two sentinel
    files with strictly increasing mtimes (file source orders batches
    by modification time under maxFilesPerTrigger=1). Sentinels are
    written in the SAME ts encoding as the source file so one declared
    stream schema covers all staged files."""
    import datetime

    dst = os.path.join(staging, "000_events.parquet")
    shutil.copyfile(os.path.join(sf_dir, "events.parquet"), dst)
    max_ts = spark.read.schema(ddl).parquet(dst).agg(F.max("ts")).first()[0]
    base_mtime = os.stat(dst).st_mtime
    for i, offset_days in enumerate((10, 20), start=1):
        if ts_dtype == "bigint":  # nanos-as-long
            sentinel_ts = max_ts + offset_days * 24 * 3600 * 10**9
        else:
            sentinel_ts = max_ts + datetime.timedelta(days=offset_days)
        sentinel = spark.createDataFrame(
            [(-(10**9) - i, sentinel_ts, _SENTINEL_USER, "sentinel", 0.0, "{}")],
            ddl,
        )
        path = os.path.join(staging, f"{i:03d}_sentinel")
        sentinel.coalesce(1).write.parquet(path)
        for f in os.listdir(path):
            full = os.path.join(path, f)
            if f.endswith(".parquet"):
                shutil.move(full, os.path.join(staging, f"{i:03d}_sentinel.parquet"))
        shutil.rmtree(path, ignore_errors=True)
        os.utime(
            os.path.join(staging, f"{i:03d}_sentinel.parquet"),
            (base_mtime + 10 * i, base_mtime + 10 * i),
        )


def stream_sessionize_native(
    spark: SparkSession, sf_dir: str, gap_minutes: int = 30
) -> DataFrame:
    """Same session rows via Spark's BUILT-IN ``session_window``
    aggregation — the JVM-native stateful path and the production
    default. No per-group Python, no Arrow serde, no state schema:
    measured ~4x faster than the ``applyInPandasWithState`` variant on
    the same staged stream. Keep :func:`stream_sessionize_stateful` as
    the template for session semantics ``session_window`` can't
    express (custom per-event state transitions, early emission,
    non-gap close conditions); reach for it only then.

    ``session_window(ts, gap)`` finalizes a session when the watermark
    passes ``last_ts + gap``; the window's ``end`` is ``last_ts +
    gap``, so the emitted ``session_end`` is ``max(ts)`` aggregated
    directly, keeping the output identical to the stateful operator
    and the batch lag-window oracle.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ddl, ts_dtype = events_raw_schema(
        spark, os.path.join(sf_dir, "events.parquet")
    )
    staging = tempfile.mkdtemp(prefix="sessionize_native_")
    try:
        _stage_with_sentinels(spark, sf_dir, staging, ddl, ts_dtype)
        stream = normalize_ts(
            spark.readStream.schema(ddl)
            .option("maxFilesPerTrigger", "1")
            .parquet(staging),
            ts_dtype,
        ).withWatermark("ts", "0 seconds")
        sessions = (
            stream.groupBy(
                "user_id", F.session_window("ts", f"{gap_minutes} minutes")
            )
            .agg(
                F.min("ts").alias("session_start"),
                F.max("ts").alias("session_end"),
                F.count("*").alias("n_events"),
            )
            .select("user_id", "session_start", "session_end", "n_events")
        )
        out = drain_to_parquet(sessions, spark, "append")
        return out.where(F.col("user_id") != _SENTINEL_USER)
    finally:
        restore_shuffle_width(spark)
        shutil.rmtree(staging, ignore_errors=True)


def stream_sessionize_stateful(
    spark: SparkSession, sf_dir: str, gap_minutes: int = 30
) -> DataFrame:
    """Per-session rows (user_id, session_start, session_end, n_events)
    computed by a stateful streaming query; equals the batch lag-window
    sessionization on the same data."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ddl, ts_dtype = events_raw_schema(
        spark, os.path.join(sf_dir, "events.parquet")
    )
    staging = tempfile.mkdtemp(prefix="sessionize_")
    try:
        _stage_with_sentinels(spark, sf_dir, staging, ddl, ts_dtype)
        stream = normalize_ts(
            spark.readStream.schema(ddl)
            .option("maxFilesPerTrigger", "1")
            .parquet(staging),
            ts_dtype,
        ).withWatermark("ts", "0 seconds")
        sessions = stream.groupBy("user_id").applyInPandasWithState(
            _make_sessionizer(gap_minutes * 60 * 1_000_000),
            OUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
        # Stage to parquet (executor-parallel) and return a lazy read:
        # session output is O(users × sessions) — collecting it through
        # the driver is the one thing this path must never do at scale.
        out = drain_to_parquet(sessions, spark, "append")
        return out.where(F.col("user_id") != _SENTINEL_USER)
    finally:
        restore_shuffle_width(spark)
        shutil.rmtree(staging, ignore_errors=True)


def stream_unconverted_views(
    spark: SparkSession, sf_dir: str, window_minutes: int = 30
) -> DataFrame:
    """Views NOT followed by a purchase from the same user within
    ``window_minutes`` — the LEFT OUTER watermarked stream-stream join,
    the one join mode the inner attribution join
    (pipeline.stream_view_purchase_join) does not cover.

    Outer-ness is what makes this stateful in a way inner joins are
    not: a null-padded row may only be emitted once the watermark
    proves no matching purchase can still arrive (v_ts + window +
    delay), so unmatched views are HELD in the join state until event
    time passes them. A single-file stream would never emit them —
    the batch's own watermark update only takes effect afterwards —
    hence the sentinel staging (the sessionizers' machinery): late
    sentinel files advance event time in follow-up micro-batches and
    flush the outer state. Sentinels must pass BOTH side filters
    (each side admits event_type 'sentinel'), because the join's
    global watermark is the MIN over both sides — a sentinel dropped
    from one side would stall it; sentinel rows join only each other
    (same user, same ts) and are dropped by the final user filter.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ddl, ts_dtype = events_raw_schema(
        spark, os.path.join(sf_dir, "events.parquet")
    )
    staging = tempfile.mkdtemp(prefix="unconverted_")
    try:
        _stage_with_sentinels(spark, sf_dir, staging, ddl, ts_dtype)
        raw = normalize_ts(
            spark.readStream.schema(ddl)
            .option("maxFilesPerTrigger", "1")
            .parquet(staging),
            ts_dtype,
        )
        views = (
            raw.where(F.col("event_type").isin("view", "sentinel"))
            .select(
                F.col("user_id").alias("v_user"),
                F.col("event_id").alias("v_id"),
                F.col("ts").alias("v_ts"),
            )
            .withWatermark("v_ts", "1 hour")
        )
        purchases = (
            raw.where(F.col("event_type").isin("purchase", "sentinel"))
            .select(
                F.col("user_id").alias("p_user"),
                F.col("event_id").alias("p_id"),
                F.col("ts").alias("p_ts"),
            )
            .withWatermark("p_ts", "1 hour")
        )
        joined = views.join(
            purchases,
            (F.col("v_user") == F.col("p_user"))
            & (F.col("p_ts") >= F.col("v_ts"))
            & (
                F.col("p_ts")
                <= F.col("v_ts") + F.expr(f"INTERVAL {window_minutes} MINUTES")
            ),
            "leftOuter",
        )
        # The p_id IS NULL filter runs BEFORE the sink: matched rows
        # are discarded anyway, and a null-accepting predicate on the
        # null-extended (right) side cannot be pushed below the outer
        # join — staging shrinks from O(matches) to O(unconverted
        # views). The sentinel-user filter must stay AFTER the sink:
        # it is a LEFT-side predicate the optimizer pushes below the
        # join and the views-side EventTimeWatermark, which starves
        # that watermark of the sentinel rows and stalls the outer
        # state flush (observed as undercounted users when both
        # filters ran pre-drain).
        unconverted = joined.where(F.col("p_id").isNull())
        result = drain_to_parquet(unconverted, spark, "append")
        return (
            result.where(F.col("v_user") != _SENTINEL_USER)
            .groupBy(F.col("v_user").alias("user_id"))
            .agg(F.count("*").alias("unconverted_views"))
        )
    finally:
        restore_shuffle_width(spark)
        shutil.rmtree(staging, ignore_errors=True)
