"""IVF ANN recall pins (the test promised by plans/temporal.py's
ann_ivf_topk registration).

KMeans cell assignments aren't reproducible across engines, so the
driver's DuckDB oracle can't check ann_ivf_topk; recall against the
exact brute-force scan is pinned here instead.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_mudah_spark.operators.similarity import brute_force_topk, ivf_topk
from etl_mudah_spark.tables import load
from tests.conftest import SF_SMOKE


def test_ivf_topk_recall_vs_brute_force(spark):
    emb = load(spark, SF_SMOKE, "embeddings")
    q = [float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    exact = [r["vec_id"] for r in brute_force_topk(emb, q, k=10).collect()]
    approx = [r["vec_id"] for r in ivf_topk(emb, q, k=10, n_cells=8, n_probe=4).collect()]
    # The query vector itself must always survive cell pruning, and the
    # probe set should keep a reasonable share of true neighbors.
    assert approx[0] == 0
    assert len(set(exact) & set(approx)) >= 5


def test_ivf_probe_widening_monotone(spark):
    """Probing every cell must recover the exact answer; fewer probes
    can only shrink the candidate set."""
    emb = load(spark, SF_SMOKE, "embeddings")
    q = [float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    exact = [r["vec_id"] for r in brute_force_topk(emb, q, k=10).collect()]
    full = [
        r["vec_id"]
        for r in ivf_topk(emb, q, k=10, n_cells=8, n_probe=8).collect()
    ]
    assert full == exact
