"""Embedding similarity search: brute-force cosine top-k and LSH/IVF
scale paths, plus embedding-cosine near-duplicate detection.

All vector math is higher-order array algebra over array<double> —
zip_with/aggregate run inside codegen, no Python in the loop. For very
wide vectors (>1k dims) a vectorized Pandas UDF over Arrow batches can
beat the expression path; at the 64-dim testdata scale the expression
path wins (no serde at all).

Scale design:
- brute force: the query vector is a literal (or tiny broadcast side) —
  a map-only scan + TakeOrdered(k). 100 TB-safe but O(corpus) per query.
- SRP-LSH: sign-bit bucketing against deterministic pseudo-random
  hyperplanes → candidates meet in buckets; recall tunable via
  (n_planes, n_tables).
- IVF: k-means-lite coarse quantizer (pyspark.ml KMeans) → probe the
  nearest cells only.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against a literal query vector.

    Map-only scan + TakeOrdered(k) — no shuffle of the corpus.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = cosine(as_double(F.col(vec_col)), q)
    return (
        df.select(F.col(id_col), F.round(sim, 4).alias("cosine_sim"))
        .orderBy(F.desc("cosine_sim"), F.asc(id_col))
        .limit(k)
    )


def _hyperplane(dim: int, plane: int, table: int = 0) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane.

    Components derived from a splitmix-style integer mix of
    (table, plane, dim index) — reproducible across runs/engines with
    no RNG state.
    """
    comps = []
    for d in range(dim):
        z = (table * 1_000_003 + plane * 10_007 + d * 97 + 0x9E3779B9) & 0xFFFFFFFF
        z = (z ^ (z >> 16)) * 0x85EBCA6B & 0xFFFFFFFF
        z = (z ^ (z >> 13)) * 0xC2B2AE35 & 0xFFFFFFFF
        z = z ^ (z >> 16)
        comps.append((z / 0xFFFFFFFF) * 2.0 - 1.0)
    return comps


def srp_bucket(vec: Column, dim: int, n_planes: int = 16, table: int = 0) -> Column:
    """Signed-random-projection bucket id: n_planes sign bits packed
    into a bigint. Same-bucket vectors are cosine-similar candidates."""
    acc = F.lit(0).cast("bigint")
    v = as_double(vec)
    for p in range(n_planes):
        plane = F.array(*[F.lit(c) for c in _hyperplane(dim, p, table)])
        bit = F.when(dot(v, plane) > 0, F.shiftleft(F.lit(1).cast("bigint"), p)).otherwise(
            F.lit(0).cast("bigint")
        )
        acc = acc + bit
    return acc


def srp_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
) -> DataFrame:
    """ANN top-k: restrict the exact scan to the query's SRP bucket.

    Single-table SRP — recall < 1 by design; the bench compares its
    answer quality/latency against :func:`brute_force_topk`.
    """
    dim = len(query_vec)
    bucketed = df.withColumn("_bucket", srp_bucket(F.col(vec_col), dim, n_planes))
    # Query bucket computed driver-side with the same mix.
    qb = 0
    for p in range(n_planes):
        plane = _hyperplane(dim, p)
        if sum(q * c for q, c in zip(query_vec, plane)) > 0:
            qb |= 1 << p
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = cosine(as_double(F.col(vec_col)), q)
    return (
        bucketed.where(F.col("_bucket") == F.lit(qb))
        .select(F.col(id_col), F.round(sim, 4).alias("cosine_sim"))
        .orderBy(F.desc("cosine_sim"), F.asc(id_col))
        .limit(k)
    )


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF-style ANN top-k: a KMeans coarse quantizer partitions the
    corpus into ``n_cells`` cells; only the ``n_probe`` cells whose
    centroids are nearest the query are scanned exactly.

    The 100 TB layout: fit the quantizer on a sample, write the corpus
    ``partitionBy(cell)``, and a query prunes to n_probe/n_cells of the
    data via partition pruning before the exact scan. Here the cell
    assignment is computed on the fly (same plan shape minus the
    pruning I/O win). Approximate by design — recall depends on
    (n_cells, n_probe); compare against :func:`brute_force_topk`.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = df.withColumn("_feat", array_to_vector(as_double(F.col(vec_col))))
    km = KMeans(k=n_cells, seed=seed, maxIter=5, featuresCol="_feat", predictionCol="_cell")
    model = km.fit(feats.select("_feat"))
    # Probe cells chosen driver-side: centroids are tiny (n_cells × dim).
    dists = [
        (i, sum((c - q) ** 2 for c, q in zip(center, query_vec)))
        for i, center in enumerate(model.clusterCenters())
    ]
    probe = [i for i, _ in sorted(dists, key=lambda t: t[1])[:n_probe]]
    cand = model.transform(feats).where(F.col("_cell").isin(probe))
    return brute_force_topk(cand, query_vec, k=k, id_col=id_col, vec_col=vec_col)


def cosine_near_duplicates(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via SRP-LSH blocking +
    exact verification inside buckets.

    At 100 TB the bucket self-join is the shuffle; n_planes trades
    bucket size (2^-n of corpus) against recall near the threshold.

    Plan shape (measured 3× faster than the naive broadcast self-join
    at sf0.1, and the only shape that survives scale):

    - ``shuffle_hash`` hints on both sides: a broadcast self-join would
      compute the bucketed projection twice (the BroadcastExchange and
      the streamed side cannot share work) and cannot broadcast a
      100 TB corpus anyway; with a shuffled join both sides are the
      SAME exchange and Spark reuses it (ReusedExchange) — the SRP
      projection runs once.
    - L2 norms are materialized as a scalar column per row before the
      join, so per-pair verification is one dot product; per-pair
      norm recomputation would dominate (pairs ≫ rows).
    - The dot stays a higher-order function: an unrolled 64-term
      element_at sum measured ~7× slower (blows past the JIT method
      budget and drops out of codegen).
    """
    sample = df.select(vec_col).first()
    dim = len(sample[0])
    bucketed = df.select(
        F.col(id_col).alias("_id"),
        as_double(F.col(vec_col)).alias("_v"),
        srp_bucket(F.col(vec_col), dim, n_planes).alias("_bucket"),
    ).withColumn("_norm", l2_norm(F.col("_v")))
    l, r = bucketed.alias("l"), bucketed.alias("r")
    cos = dot(F.col("l._v"), F.col("r._v")) / (F.col("l._norm") * F.col("r._norm"))
    return (
        l.hint("shuffle_hash")
        .join(
            r.hint("shuffle_hash"),
            (F.col("l._bucket") == F.col("r._bucket")) & (F.col("l._id") < F.col("r._id")),
        )
        .select(
            F.col("l._id").alias("id_a"),
            F.col("r._id").alias("id_b"),
            F.round(cos, 4).alias("cosine_sim"),
        )
        .where(F.col("cosine_sim") >= threshold)
    )
