"""End-to-end pin for the registered doc_dup_clusters query: the Spark
pipeline (exact Jaccard pairs -> connected components -> survivor
mapping) must agree with a driver-side union-find over the SAME pair
list at smoke scale. Pair detection itself is pinned separately against
an exact-Python oracle in tests/test_dedup.py; the driver additionally
hash-checks the whole mapping against a DuckDB recursive-CTE closure."""

from __future__ import annotations

import pytest

from etl_mudah_spark.operators.dedup import ngram_jaccard_pairs
from etl_mudah_spark.plans.datapipe import _NGRAM_MAX_SHINGLE_DF
from etl_mudah_spark.plans.registry import REGISTRY
from etl_mudah_spark.tables import load
from tests.conftest import SF_SMOKE


def _union_find_clusters(pairs: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@pytest.fixture(scope="module")
def expected(spark):
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in ngram_jaccard_pairs(
            load(spark, SF_SMOKE, "documents"),
            threshold=0.2,
            max_shingle_df=_NGRAM_MAX_SHINGLE_DF,
        ).collect()
    ]
    assert pairs, "smoke corpus must contain planted near-dups"
    return _union_find_clusters(pairs)


def test_doc_dup_clusters_matches_union_find(spark, expected):
    rows = REGISTRY["doc_dup_clusters"].spark_fn(spark, SF_SMOKE).collect()
    got = {r["doc_id"]: r["cluster_id"] for r in rows}
    assert got == expected


def test_doc_dup_clusters_sizes_and_survivors(spark, expected):
    from collections import Counter

    sizes = Counter(expected.values())
    rows = REGISTRY["doc_dup_clusters"].spark_fn(spark, SF_SMOKE).collect()
    for r in rows:
        assert r["n_docs"] == sizes[r["cluster_id"]]
        assert r["is_survivor"] == (r["doc_id"] == r["cluster_id"])
    # exactly one survivor per cluster
    survivors = [r["doc_id"] for r in rows if r["is_survivor"]]
    assert sorted(survivors) == sorted(sizes)


def test_doc_split_no_leakage_requires_convergence():
    """The no_leakage=true contract is 'zero cross-split pairs BY
    CONSTRUCTION', which only a completed transitive closure delivers —
    the plan must pass on_nonconverged='raise' (ADVICE r11), never the
    warn default that would emit a false audit row."""
    import inspect

    from etl_mudah_spark.plans import datapipe as dp

    src = inspect.getsource(dp.doc_split_no_leakage)
    assert 'on_nonconverged="raise"' in src
