"""Change-data-capture diff between two table snapshots.

The lakehouse "change data feed" shape (what Delta CDF / Iceberg
changelog scans expose): given an old and a new snapshot of a keyed
table, emit one row per changed key classified as ``insert`` /
``delete`` / ``update``, with the pre- and post-image of the compared
columns. Composes with :mod:`etl_mudah_spark.operators.manifest` —
retained versions ARE snapshots, so ``manifest_diff`` answers "what
changed between version 41 and 42" without any change log having been
recorded at write time.

Scale: the diff is ONE full-outer hash join on the key columns — the
minimum possible data movement for snapshot differencing (every row's
fate depends on exactly its key twin). Column comparison happens on an
xxhash64 fingerprint of the compared columns computed map-side BEFORE
the shuffle, so wide rows never travel twice: the join carries key +
8-byte hash + (only when images are requested) the compared columns
themselves. Unchanged keys — the overwhelming majority in a typical
snapshot pair — are dropped immediately after the join. Co-locate the
two snapshots (same bucketing / partitioning, operators/layout.py
``write_bucketed_table``) and the exchange disappears entirely.

Reference parity note: the reference's pipeline overwrites its table
in place on every run (load_to_postgres, dags/dag.py:243-266), so
"what changed since yesterday" is unanswerable there; this operator is
the beyond-reference capability that makes the manifest-versioned
variant of that sink auditable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CHANGE_COL = "change_type"


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
    include_images: bool = True,
) -> DataFrame:
    """Keyed snapshot diff: ``(key_cols…, change_type, old_…, new_…)``.

    ``change_type`` is ``insert`` (key only in ``new``), ``delete``
    (only in ``old``) or ``update`` (both sides, compared columns
    differ). Keys present in both with identical compared columns are
    dropped. ``compare_cols`` defaults to every shared non-key column;
    comparison is null-safe (NULL == NULL) via an xxhash64 fingerprint
    — hash collision on a 64-bit keyed hash is ~2⁻⁶⁴ per pair, the
    standard CDC tradeoff (pass the columns explicitly to narrow, or
    compare fewer).

    With ``include_images`` the pre/post values of each compared
    column ride along as ``old_<col>`` / ``new_<col>`` (inserts have
    NULL pre-images, deletes NULL post-images — the CDF convention).
    ``include_images=False`` keeps the shuffle at key+hash width for
    change-detection-only scans over very wide tables.

    Keys must be unique per snapshot (a table contract, not enforced
    here — a duplicated key would fan out the join).
    """
    keys = list(key_cols)
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in set(keys)]
    cmp_cols = list(compare_cols)

    def fingered(df: DataFrame, side: str) -> DataFrame:
        # map-side fingerprint: null-safe by encoding NULL distinctly
        # from any real value (coalesce to a sentinel AND a null flag)
        parts: list = []
        for c in cmp_cols:
            parts.append(F.col(c).isNull().cast("int"))
            parts.append(F.coalesce(F.col(c).cast("string"), F.lit("")))
        fp = F.xxhash64(*parts) if parts else F.lit(0)
        cols = [F.col(k) for k in keys] + [fp.alias(f"_fp_{side}")]
        if include_images:
            cols += [F.col(c).alias(f"{side}_{c}") for c in cmp_cols]
        cols.append(F.lit(True).alias(f"_in_{side}"))
        return df.select(*cols)

    joined = fingered(old, "old").join(fingered(new, "new"), keys, "full_outer")
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("insert"))
        .when(F.col("_in_new").isNull(), F.lit("delete"))
        .when(F.col("_fp_old") != F.col("_fp_new"), F.lit("update"))
    )
    out = joined.withColumn(CHANGE_COL, change).where(F.col(CHANGE_COL).isNotNull())
    keep = keys + [CHANGE_COL]
    if include_images:
        keep += [f"old_{c}" for c in cmp_cols] + [f"new_{c}" for c in cmp_cols]
    return out.select(*keep)


def apply_diff(
    snapshot: DataFrame,
    diff: DataFrame,
    key_cols: Sequence[str],
) -> DataFrame:
    """Replay a :func:`table_diff` (with images) onto the OLD snapshot,
    reconstructing the new one: delete the deletes, upsert the
    insert/update post-images. ``table_diff`` ∘ ``apply_diff`` is the
    identity on the compared columns — the round-trip invariant
    pinned (property-based) in tests/test_cdc.py.

    This is the downstream half of CDC: ship the (small) diff instead
    of the (huge) snapshot, apply it at the replica. One left_anti
    join removes deleted/updated keys, one union adds the post-images
    — both shuffle only on the keys, and the anti join's build side is
    the diff, which is small by the premise of shipping diffs at all.
    Only columns captured by the diff (keys + compared columns) are
    reconstructed; project the snapshot accordingly before comparing.
    """
    keys = list(key_cols)
    new_cols = [c for c in diff.columns if c.startswith("new_")]
    post = diff.where(F.col(CHANGE_COL) != "delete").select(
        *keys, *[F.col(c).alias(c[len("new_"):]) for c in new_cols]
    )
    touched = diff.select(*keys)
    kept = snapshot.select(*keys, *[c[len("new_"):] for c in new_cols]).join(
        touched, keys, "left_anti"
    )
    return kept.unionByName(post)


def manifest_diff(
    spark: SparkSession,
    base: str,
    key_cols: Sequence[str],
    from_version: int | None = None,
    to_version: int | None = None,
    compare_cols: Sequence[str] | None = None,
    include_images: bool = True,
) -> DataFrame:
    """:func:`table_diff` between two RETAINED manifest versions of a
    :func:`~etl_mudah_spark.operators.manifest.manifest_publish` table.

    Defaults diff the previous retained version against the live one —
    "what did the last publish change". Versions must still be on disk
    (``manifest_publish(keep=…)`` retention); naming a pruned version
    raises rather than silently diffing the wrong data.
    """
    import os

    from etl_mudah_spark.operators.manifest import _version_dirs, manifest_current

    vdirs = _version_dirs(base)
    live = manifest_current(base)
    if live is None or not vdirs:
        raise ValueError(f"manifest_diff: {base!r} has no published versions")

    def resolve(v: int | None, default_name: str) -> str:
        name = f"v={v:08d}" if v is not None else default_name
        if name not in vdirs:
            raise ValueError(
                f"manifest_diff: version {name!r} not on disk (retained: "
                f"{vdirs}; raise manifest_publish(keep=…) to diff further back)"
            )
        return os.path.join(base, name)

    to_dir = resolve(to_version, os.path.basename(live))
    to_name = os.path.basename(to_dir)
    older = [d for d in vdirs if d < to_name]
    if from_version is None and not older:
        raise ValueError(
            f"manifest_diff: no retained version older than {to_name} "
            f"(retained: {vdirs})"
        )
    from_dir = resolve(from_version, older[-1] if older else "")
    return table_diff(
        spark.read.parquet(from_dir),
        spark.read.parquet(to_dir),
        key_cols,
        compare_cols=compare_cols,
        include_images=include_images,
    )
