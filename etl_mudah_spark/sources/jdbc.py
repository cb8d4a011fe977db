"""JDBC source/sink: partitioned parallel reads and an upsert writer.

The reference's warehouse is Postgres — read by the dashboard
(streamlit/utils/data_loader.py:19-30) and written with ON CONFLICT
upsert (dags/dag.py:243-266). This module is that surface on Spark's
JDBC data source, exercised for real against the EMBEDDED Derby
database Spark ships (tests/test_jdbc.py) — same code path
(`spark.read/write.format("jdbc")`), different URL in production.

Scale design:

- **Reads must be partitioned or they are single-threaded.** A bare
  ``spark.read.jdbc(url, table)`` opens ONE connection and streams the
  whole table through one task — the classic silent bottleneck.
  :func:`jdbc_read_partitioned` always issues N range-partitioned
  queries (``partitionColumn`` + bounds); when bounds aren't supplied
  it fetches MIN/MAX first via one 1-row JDBC query — two round trips
  total, N parallel streams after. Predicates/column pruning push into
  the remote queries (Spark's JDBC pushdown), so the database does the
  filtering, not the cluster.
- **Writes batch.** ``batchsize`` controls rows per INSERT round trip;
  the default 10k keeps the driver-side latency out of the hot path.
- **Upsert = stage + MERGE, not row-at-a-time ON CONFLICT.** The
  reference executes one INSERT…ON CONFLICT per batch via a cursor;
  at scale the correct shape is: append the batch into a staging
  table (parallel, batched), then ONE set-based ``MERGE`` statement
  server-side, then drop staging. The merge is a single transaction on
  the database — partial-failure safe — and the only driver-side JDBC
  work is issuing two statements (:func:`jdbc_upsert`).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession


def _jdbc_options(url: str, properties: Mapping[str, str] | None) -> dict:
    opts = {"url": url}
    if properties:
        opts.update(properties)
    return opts


def jdbc_read_partitioned(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str,
    num_partitions: int = 8,
    lower: int | None = None,
    upper: int | None = None,
    properties: Mapping[str, str] | None = None,
) -> DataFrame:
    """Range-partitioned JDBC read: N concurrent connections each
    scanning one stripe of ``partition_column`` (a numeric/temporal
    indexed column — typically the primary key). Bounds default to a
    1-row MIN/MAX probe against the table; pass them explicitly to
    skip that round trip when the caller already knows the range.

    Note Spark's contract: rows OUTSIDE [lower, upper) still arrive
    (the first/last stripe queries are open-ended) — bounds shape the
    stripes, they do not filter.
    """
    if lower is None or upper is None:
        bounds = (
            spark.read.format("jdbc")
            .options(**_jdbc_options(url, properties))
            .option(
                "query",
                f'SELECT MIN("{partition_column}") AS lo, '
                f'MAX("{partition_column}") AS hi FROM {table}',
            )
            .load()
            .first()
        )
        # positional access: the database may case-fold the aliases
        # (Derby returns LO/HI for an unquoted "AS lo")
        if bounds is None or bounds[0] is None:
            # empty table: any stripe layout reads nothing
            lower, upper = 0, 1
        else:
            lower, upper = int(bounds[0]), int(bounds[1])
    return (
        spark.read.format("jdbc")
        .options(**_jdbc_options(url, properties))
        .option("dbtable", table)
        .option("partitionColumn", partition_column)
        .option("lowerBound", str(lower))
        .option("upperBound", str(max(upper, lower + 1)))
        .option("numPartitions", str(num_partitions))
        .load()
    )


def jdbc_write(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batchsize: int = 10_000,
    properties: Mapping[str, str] | None = None,
) -> None:
    """Batched JDBC append/overwrite (each task writes its partition
    over its own connection — parallelism = df partitions)."""
    (
        df.write.format("jdbc")
        .options(**_jdbc_options(url, properties))
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .mode(mode)
        .save()
    )


def _execute(
    spark: SparkSession,
    url: str,
    sql: str,
    properties: Mapping[str, str] | None = None,
) -> None:
    """Run one server-side statement over a driver JDBC connection
    (py4j → java.sql.DriverManager). Used ONLY for DDL/MERGE control
    statements — never for data movement, which stays on the batched
    executor path. ``properties`` (user/password/driver options — the
    same mapping jdbc_write honors) is forwarded so the control
    connection authenticates exactly like the staging write did."""
    jvm = spark._sc._jvm
    props = jvm.java.util.Properties()
    for k, v in (properties or {}).items():
        props.setProperty(str(k), str(v))
    conn = jvm.java.sql.DriverManager.getConnection(url, props)
    try:
        stmt = conn.createStatement()
        try:
            stmt.execute(sql)
        finally:
            stmt.close()
    finally:
        conn.close()


def jdbc_upsert(
    spark: SparkSession,
    batch: DataFrame,
    url: str,
    table: str,
    key_cols: Sequence[str],
    staging_table: str | None = None,
    batchsize: int = 10_000,
    properties: Mapping[str, str] | None = None,
) -> None:
    """Set-based upsert: append ``batch`` into a staging table
    (parallel batched INSERTs), then one server-side ``MERGE`` into
    ``table`` (update matched keys' non-key columns, insert the rest),
    then drop staging. The reference's row-cursor ON CONFLICT loop
    (dags/dag.py:250-266) as one transaction-safe statement. The batch
    must be unique per key (dedupe upstream — operators/merge.py
    one-pass rule); ANSI MERGE raises on duplicate source keys rather
    than last-write-winning silently.
    """
    keys = list(key_cols)
    non_keys = [c for c in batch.columns if c not in set(keys)]
    stage = staging_table or f"{table}_STAGE"
    jdbc_write(batch, url, stage, mode="overwrite", batchsize=batchsize,
               properties=properties)

    def q(c: str) -> str:
        # ANSI-quoted identifiers: Spark's JDBC writer creates quoted
        # (case-exact) column names, so server-side SQL must quote too
        return '"' + c + '"'

    on = " AND ".join(f"t.{q(k)} = s.{q(k)}" for k in keys)
    set_clause = ", ".join(f"t.{q(c)} = s.{q(c)}" for c in non_keys)
    cols = ", ".join(q(c) for c in batch.columns)
    vals = ", ".join(f"s.{q(c)}" for c in batch.columns)
    merge = (
        f"MERGE INTO {table} t USING {stage} s ON {on} "
        + (f"WHEN MATCHED THEN UPDATE SET {set_clause} " if non_keys else "")
        + f"WHEN NOT MATCHED THEN INSERT ({cols}) VALUES ({vals})"
    )
    _execute(spark, url, merge, properties=properties)
    _execute(spark, url, f"DROP TABLE {stage}", properties=properties)
