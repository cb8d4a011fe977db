"""Differential test: every registered query with an oracle must match
DuckDB on the same parquet tables — the same gate the driver runs
(CORRECTNESS_r{N}.json), at smoke scale for speed."""

from __future__ import annotations

import pytest

import etl_mudah_spark.plans  # noqa: F401
from etl_mudah_spark.plans.registry import REGISTRY
from tests.conftest import SF_SMOKE
from tests.oracle_utils import compare_with_oracle

WITH_ORACLE = sorted(name for name, q in REGISTRY.items() if q.oracle)
ROWS_ONLY = sorted(name for name, q in REGISTRY.items() if not q.oracle)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_matches_duckdb_oracle(spark, name):
    compare_with_oracle(spark, REGISTRY[name], SF_SMOKE)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    df = REGISTRY[name].spark_fn(spark, SF_SMOKE)
    assert df.count() >= 0
    assert df.schema.fieldNames()
