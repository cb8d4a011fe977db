"""Differential-testing helper mirroring the driver's DuckDB comparator:
row-count + schema-width + order-insensitive value comparison with
columns sorted by name."""

from __future__ import annotations

import math
from pathlib import Path

import duckdb
import pandas as pd

from etl_mudah_spark.tables import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _canon(df: pd.DataFrame) -> list[tuple]:
    df = df.reindex(sorted(df.columns), axis=1)

    def norm(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return None
        if isinstance(v, float):
            # kill -0.0 and representation noise beyond the rounding the
            # queries already apply
            return round(v + 0.0, 9)
        if isinstance(v, pd.Timestamp):
            return v.to_pydatetime().replace(tzinfo=None)
        if hasattr(v, "item"):
            try:
                return norm(v.item())
            except (ValueError, AttributeError):
                pass
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return tuple(norm(x) for x in v)
        return v

    rows = [tuple(norm(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return sorted(rows, key=repr)


def compare_with_oracle(spark, query, sf_dir: str) -> None:
    """Assert the Spark result of ``query`` matches its DuckDB oracle."""
    spark_pdf = query.spark_fn(spark, sf_dir).toPandas()
    con = duckdb_conn(sf_dir)
    try:
        oracle_pdf = con.execute(query.oracle).df()
    finally:
        con.close()
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{query.name}: row count {len(spark_pdf)} != oracle {len(oracle_pdf)}"
    )
    assert sorted(c.lower() for c in spark_pdf.columns) == sorted(
        c.lower() for c in oracle_pdf.columns
    ), f"{query.name}: columns {sorted(spark_pdf.columns)} != {sorted(oracle_pdf.columns)}"
    s_rows, o_rows = _canon(spark_pdf), _canon(oracle_pdf)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b
    ]
    assert not mismatches, f"{query.name}: first mismatches {mismatches[:3]}"
