"""IVF-PQ composite index: coarse partition pruning + residual-PQ
compressed scan (operators/similarity.py ivfpq_*).

Pins: recall vs brute force on the hard uniform fixture, persisted
round-trip parity with the on-the-fly variant, planning-time
partition pruning of the compressed scan, O(batch) append parity,
residual-PQ beating raw-PQ quantization error at equal (m, k), and
determinism of the build.
"""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_mudah_spark.operators import similarity as sim
from etl_mudah_spark.tables import load

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load(spark, SF, "embeddings")


@pytest.fixture(scope="module")
def brute_ids(spark, emb):
    probe = sim.probe_row(emb)
    return [r["vec_id"] for r in sim.brute_force_topk_df(emb, probe, k=10).collect()]


@pytest.fixture(scope="module")
def index(spark, emb, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivfpq") / "index")
    sim.ivfpq_build_index(emb, path, n_cells=8, m=8, k=16, sample_mod=1)
    return path


def test_ivfpq_recall_vs_brute_force(spark, emb, brute_ids, index):
    # uniform synthetic vectors with neighbors at cosine ~0.3 are the
    # coarse quantizer's worst case (see ann_ivf_topk); 8/10 floor with
    # probe 6/8 — measured 9/10, the miss is cell pruning, not PQ.
    probe = sim.probe_row(emb)
    out = sim.ivfpq_query_index_df(
        spark, emb, index, probe, k=10, n_probe=6, shortlist=100
    )
    got = {r["vec_id"] for r in out.collect()}
    assert len(got & set(brute_ids)) >= 8


def test_ivfpq_topk_df_matches_persisted_index(spark, emb, index):
    # same (seed, cells, books, probes) => identical result sets
    probe = sim.probe_row(emb)
    fly = sim.ivfpq_topk_df(
        emb, probe, k=10, n_cells=8, m=8, n_codes=16, n_probe=6,
        shortlist=100, sample_mod=1,
    )
    idx = sim.ivfpq_query_index_df(
        spark, emb, index, probe, k=10, n_probe=6, shortlist=100
    )
    assert [tuple(r) for r in fly.collect()] == [tuple(r) for r in idx.collect()]


def test_ivfpq_compressed_scan_partition_pruning(spark, index):
    # the per-query scan opens only the probed cells' partitions, and
    # reads codes — never raw vectors
    scan = spark.read.parquet(index).where(F.col("cell").isin([0, 3]))
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "cell" in plan.split("PartitionFilters", 1)[1][:200]
    assert "embedding" not in scan.columns  # compressed: ids + codes only


def test_ivfpq_append_matches_full_build_queries(spark, emb, brute_ids, tmp_path):
    # build from evens, append odds: the grown index answers like one
    # holding the whole corpus (codebooks/centroids frozen)
    path = str(tmp_path / "index")
    sim.ivfpq_build_index(
        emb.where(F.col("vec_id") % 2 == 0), path, n_cells=8, m=8, k=16,
        sample_mod=1,
    )
    sim.ivfpq_index_append(spark, path, emb.where(F.col("vec_id") % 2 == 1))
    grown = spark.read.parquet(path)
    assert grown.count() == emb.count()
    probe = sim.probe_row(emb)
    out = sim.ivfpq_query_index_df(
        spark, emb, path, probe, k=10, n_probe=6, shortlist=100
    )
    got = {r["vec_id"] for r in out.collect()}
    assert len(got & set(brute_ids)) >= 8


def test_ivfpq_build_deterministic(spark, emb, index, tmp_path):
    # seeded KMeans + ordered codebook sample: a second build writes
    # byte-identical assignments and codes
    path = str(tmp_path / "index2")
    sim.ivfpq_build_index(emb, path, n_cells=8, m=8, k=16, sample_mod=1)
    a = {r["vec_id"]: (r["cell"], tuple(r["pq_codes"]))
         for r in spark.read.parquet(index).collect()}
    b = {r["vec_id"]: (r["cell"], tuple(r["pq_codes"]))
         for r in spark.read.parquet(path).collect()}
    assert a == b


def test_residual_pq_tightens_quantization_error(spark, emb, index):
    # the reason IVF-PQ beats PQ-inside-cells: after subtracting the
    # cell centroid the codebooks quantize a tighter distribution.
    # Reconstruct both ways at equal (m, k) and compare MSE corpus-wide.
    books_raw = sim.pq_train_codebooks(emb, m=8, k=16, sample_mod=1)
    raw_codes = {
        r["vec_id"]: r["pq_codes"]
        for r in sim.pq_encode(emb, books_raw).collect()
    }
    cents = {
        r["cell"]: np.array(r["centroid"])
        for r in spark.read.parquet(f"{index}/_centroids").collect()
    }
    cb = spark.read.parquet(f"{index}/_codebooks").collect()
    books_res = np.empty((8, 16, 8))
    for r in cb:
        books_res[r["subspace"], r["code"]] = r["centroid"]
    idx_rows = {
        r["vec_id"]: (r["cell"], r["pq_codes"])
        for r in spark.read.parquet(index).collect()
    }
    vecs = {
        r["vec_id"]: np.array(r["v"])
        for r in emb.select(
            "vec_id", sim.as_double(F.col("embedding")).alias("v")
        ).collect()
    }

    def recon(codes, books):
        return np.concatenate([books[i, codes[i]] for i in range(8)])

    err_raw = err_res = 0.0
    for vid, v in vecs.items():
        xn = v / max(np.linalg.norm(v), 1e-12)
        err_raw += float(((xn - recon(raw_codes[vid], books_raw)) ** 2).sum())
        cell, codes = idx_rows[vid]
        err_res += float(
            ((xn - cents[cell] - recon(codes, books_res)) ** 2).sum()
        )
    assert err_res < err_raw


def test_ivfpq_artifacts_invisible_to_data_scan(spark, index):
    # underscore dirs don't leak into the partitioned scan
    cols = set(spark.read.parquet(index).columns)
    assert cols == {"vec_id", "pq_codes", "cell"}
    assert os.path.isdir(f"{index}/_centroids")
    assert os.path.isdir(f"{index}/_codebooks")


def test_ivfpq_maintain_rebuilds_exactly_once_on_drift(spark, emb, tmp_path):
    # same contract as ivf_maintain (tests/test_similarity_ivf.py) on
    # the composite layout: no-op under the bound, exactly one staged
    # rebuild past it, source_df supplying the vectors the code-only
    # index cannot
    path = str(tmp_path / "index")
    sim.ivfpq_build_index(emb, path, n_cells=8, m=8, k=16, sample_mod=1)
    r0 = sim.ivfpq_maintain(spark, path, emb, max_imbalance=50.0, sample_mod=1)
    assert r0["rebuilt"] is False

    n = emb.count()
    # The composite fits its quantizer on L2-NORMALIZED vectors, so
    # magnitude-offset blobs (the ivf_maintain test's drift) collapse
    # to ONE direction under normalization and a re-fit could never
    # separate them. Directional drift instead: four all-positive
    # blobs, blob j carrying 4x extra mass on coordinates i % 4 == j —
    # pairwise cosine ~0.53 (cleanly separable; at ~0.86 the seeded
    # KMeans left three blobs merged, ratio 4.8) while all four sit
    # far from the random-sign originals, so frozen assignment
    # concentrates them (measured ratio 5.2) and the re-fit splits
    # them 500/500/500/500 (measured 1.6) — wide margins around the
    # 4.0 bound on both sides.
    drift = spark.range(10_000, 10_000 + 4 * n).selectExpr(
        "id AS vec_id",
        "transform(sequence(1, 64),"
        " i -> CAST(9.0 + CASE WHEN i % 4 = id % 4 THEN 27.0 ELSE 0 END"
        " + 0.1 * sin(id * i * 2.7) AS FLOAT)) AS embedding",
    )
    sim.ivfpq_index_append(spark, path, drift)
    corpus = emb.select("vec_id", "embedding").unionByName(drift)
    r1 = sim.ivfpq_maintain(spark, path, corpus, max_imbalance=4.0, sample_mod=1)
    assert r1["rebuilt"] is True
    rebuilt = spark.read.parquet(path)
    assert rebuilt.count() == 5 * n
    assert r1["imbalance_ratio"] > 4.0
    r2 = sim.ivfpq_maintain(spark, path, corpus, max_imbalance=4.0, sample_mod=1)
    assert r2["rebuilt"] is False
    assert r2["imbalance_ratio"] <= r1["imbalance_ratio"]
    assert not os.path.exists(path + "._rebuilding")
    assert not os.path.exists(path + "._preindex")


def test_ivfpq_cell_ranking_scale_invariant(spark, emb, index):
    """ADVICE r7: coarse cells are ranked for the probe in the SAME
    normalized space the centroids were fit in, so scaling the probe
    vector (cosine-irrelevant) must not change which cells are probed
    or the final top-k."""
    probe = sim.probe_row(emb)
    big = probe.select(F.transform("_pv", lambda x: x * 50.0).alias("_pv"))
    base = sim.ivfpq_query_index_df(
        spark, emb, index, probe, k=10, n_probe=2, shortlist=100
    )
    scaled = sim.ivfpq_query_index_df(
        spark, emb, index, big, k=10, n_probe=2, shortlist=100
    )
    assert [tuple(r) for r in base.collect()] == [
        tuple(r) for r in scaled.collect()
    ]


def test_ivfpq_maintain_recovers_interrupted_publish(spark, emb, tmp_path):
    # composite-layout twin of the ivf_maintain recovery pin: the
    # _codebooks sidecar participates in the completeness check
    import shutil

    path = str(tmp_path / "index")
    sim.ivfpq_build_index(emb, path, n_cells=8, m=8, k=16, sample_mod=1)
    n = emb.count()
    shutil.copytree(path, path + "._rebuilding")
    os.rename(path, path + "._preindex")
    r = sim.ivfpq_maintain(spark, path, emb, max_imbalance=50.0, sample_mod=1)
    assert r["recovered"] == "promoted_rebuilding"
    assert spark.read.parquet(path).count() == n
    # incomplete sidecar: missing _codebooks/_SUCCESS fails the
    # completeness check and the retired index is restored
    shutil.copytree(path, path + "._rebuilding")
    os.remove(path + "._rebuilding/_codebooks/_SUCCESS")
    os.rename(path, path + "._preindex")
    r = sim.ivfpq_maintain(spark, path, emb, max_imbalance=50.0, sample_mod=1)
    assert r["recovered"] == "restored_preindex"
    assert spark.read.parquet(path).count() == n
