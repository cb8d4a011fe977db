"""Registry of declared queries and their DuckDB-oracle twins.

Every operator the engine claims (SURVEY.md §2 + the training-data
extensions) registers here as a named query:

- ``spark_fn(spark, sf_dir) -> DataFrame`` — the engine's plan.
- ``oracle`` — equivalent ANSI SQL DuckDB runs on the same parquet
  tables (views: region nation customer supplier part orders lineitem
  events documents embeddings). ``None`` for non-SQL-expressible ops
  (the driver then records a weaker rows-only check).

Column-name discipline: the driver's comparator sorts columns by name
before value-hashing, so every computed column is aliased identically
on both sides. Float discipline: aggregate outputs are rounded (2-4
decimals) on BOTH sides because summation order differs between Spark
partitions and DuckDB morsels.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    spark_fn: SparkFn
    oracle: str | None
    doc: str


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register a (spark_fn, oracle_sql) pair under ``name``."""

    def deco(fn: SparkFn) -> SparkFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, spark_fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def queries() -> dict[str, SparkFn]:
    return {q.name: q.spark_fn for q in REGISTRY.values()}


def oracle_sql() -> dict[str, str]:
    return {q.name: q.oracle for q in REGISTRY.values() if q.oracle is not None}
