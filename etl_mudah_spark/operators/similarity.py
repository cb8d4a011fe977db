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

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def _unit_project(
    df: DataFrame, vec_col, out: str, keep: list
) -> DataFrame:
    """Project ``df`` to ``keep`` + a unit-normalized ``out`` array.

    Normalizing below the join is the whole point: batch_topk's
    per-(probe, candidate) cosine used to fold dot + BOTH norms per
    pair, re-evaluating each corpus row's norm once per probe — on the
    interpreted higher-order-function path that was ~3x the arithmetic
    of the bare dot left here (measured 9.7 s -> 1.9 s on the 25-anchor
    kNN panel at sf0.01). The norm gets its own column first purely for
    plan readability; a micro-benchmark showed Spark does NOT
    re-evaluate an inlined norm per element."""
    return (
        df.select(*keep, as_double(vec_col).alias("_v"))
        .withColumn("_n", F.greatest(l2_norm(F.col("_v")), F.lit(1e-12)))
        .select(
            *keep,
            F.transform(F.col("_v"), lambda x: x / F.col("_n")).alias(out),
        )
    )


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


def batch_topk(
    df: DataFrame,
    probes: DataFrame,
    k: int = 10,
    *,
    salt_buckets: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
    corpus_cols: tuple[str, ...] = (),
    pair_filter=None,
    keep_pair_cols: bool = False,
) -> DataFrame:
    """Exact cosine top-k for EVERY probe in ONE corpus pass — the
    batch-retrieval shape a training pipeline actually runs (N query
    embeddings against the corpus), vs :func:`brute_force_topk`'s
    single literal vector.

    Scale design: the probe batch is broadcast (queries are small,
    corpora are not), cosines are computed map-side in codegen, and the
    per-probe top-k is TWO-stage: a salted window over
    (probe, hash(id) % salt_buckets) keeps k rows per salt bucket —
    ``salt_buckets``-way parallelism per probe — then a final window
    over the <= probes*salt_buckets*k partial rows picks the exact
    top-k. A single probe-partitioned window would instead sort
    corpus-sized partitions in one task per probe, which is the
    unpartitioned-window hazard wearing a partition column.

    Ties break on (rounded cosine desc, id asc) in BOTH stages, so the
    result is deterministic and engine-reproducible.

    PAIR-PREDICATE RETRIEVAL: ``pair_filter`` (a Column) restricts the
    scored (probe, candidate) pairs BEFORE the top-k — the predicate
    may reference any extra column the probe relation carries (they
    ride the broadcast) and any ``corpus_cols`` (pruned into the scan).
    This is the hard-negative-mining shape (candidates whose label
    DIFFERS from the anchor's) and differs from metadata-filtered ANN
    (ann_filtered_topk): the predicate relates the two SIDES, so it
    cannot be pushed below the join — but it applies map-side on the
    broadcast-joined stream, before any shuffle.
    """
    from pyspark.sql import Window

    extra_probe = [
        c for c in probes.columns if c not in (probe_id_col, vec_col)
    ]
    # Name-collision guard (ADVICE r13): after the projections, the
    # joined pair relation carries probe-side {probe_id_col, extras}
    # next to corpus-side {id_col, corpus_cols}. A shared name makes
    # the post-join select / pair_filter ambiguous (AnalysisException
    # at best, silent wrong-side resolution at worst) — callers
    # previously avoided it only by convention (p_label renames).
    probe_side = [probe_id_col, *extra_probe]
    corpus_side = [id_col, *corpus_cols]
    clash = set(probe_side) & set(corpus_side)
    if clash:
        raise ValueError(
            f"batch_topk: column name(s) {sorted(clash)} appear on both "
            "the probe and corpus sides of the pair relation; alias the "
            "probe extras (e.g. 'label' -> 'probe_label') or corpus_cols "
            "so pair_filter and the output are unambiguous"
        )
    reserved = {"_pv", "_cv", "_v", "_n", "_salt", "_rn", "rank", "cosine_sim"}
    taken = reserved & set(probe_side + list(corpus_side))
    if taken:
        raise ValueError(
            f"batch_topk: column name(s) {sorted(taken)} collide with "
            "internal working columns; rename them before calling"
        )
    # Normalize BOTH sides in the projections below the join (each row
    # once), so the per-(probe, candidate) work is ONE dot-product fold
    # instead of dot + two norms — the norms were being recomputed per
    # PAIR, i.e. |probes| times per corpus row (round 13; matters for
    # the interpreted higher-order-function path Spark evaluates these
    # lambdas on).
    p = _unit_project(
        probes, F.col(vec_col), "_pv",
        [F.col(probe_id_col), *extra_probe],
    )
    c = _unit_project(
        df, F.col(vec_col), "_cv",
        [F.col(id_col), *[F.col(x) for x in corpus_cols]],
    )
    scored = c.join(
        F.broadcast(p), F.col(id_col) != F.col(probe_id_col)
    )
    if pair_filter is not None:
        scored = scored.where(pair_filter)
    # keep_pair_cols rides the probe extras + corpus_cols through the
    # top-k (the kNN-vote consumers need the pair's labels); they are
    # carried, never partitioned on, so the window shape is unchanged.
    carry = (
        [*extra_probe, *corpus_cols] if keep_pair_cols else []
    )
    scored = scored.select(
        probe_id_col,
        id_col,
        F.round(dot(F.col("_cv"), F.col("_pv")), 4).alias("cosine_sim"),
        *carry,
    )
    w_partial = Window.partitionBy(probe_id_col, "_salt").orderBy(
        F.desc("cosine_sim"), F.asc(id_col)
    )
    partial = (
        scored.withColumn(
            "_salt", F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt_buckets))
        )
        .withColumn("_rn", F.row_number().over(w_partial))
        .where(F.col("_rn") <= k)
    )
    w_final = Window.partitionBy(probe_id_col).orderBy(
        F.desc("cosine_sim"), F.asc(id_col)
    )
    return (
        partial.select(probe_id_col, id_col, "cosine_sim", *carry)
        .withColumn("rank", F.row_number().over(w_final))
        .where(F.col("rank") <= k)
    )


def mmr_topk(
    df: DataFrame,
    probes: DataFrame,
    k: int = 5,
    *,
    shortlist: int = 20,
    lam: float = 0.7,
    penalty: float = 0.3,
    salt_buckets: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
) -> DataFrame:
    """Maximal-Marginal-Relevance diversified retrieval: per probe,
    greedily select ``k`` results from the exact cosine top-``shortlist``,
    each step maximizing ``lam * relevance - penalty * max-similarity-to-
    already-selected`` — the re-rank a RAG retriever or a
    diversity-aware training sampler runs so the result set is not k
    near-copies of the same document.

    Scale design: stage 1 is :func:`batch_topk` (one corpus pass for
    the whole probe batch, salted two-stage top-k); everything after
    operates on the BOUNDED shortlist — ``probes x shortlist`` rows,
    ``probes x shortlist^2`` pair similarities — and is localCheckpointed
    so the k-1 greedy iterations (driver-side loop over DataFrames,
    bounded by the PARAMETER k, never by data) do not replay the corpus
    scan once per selection step. Scores round to 6 and ties break on
    (score desc, id asc), so the greedy path is deterministic and
    oracle-reproducible; ``lam``/``penalty`` are both explicit literals
    because ``1 - 0.7`` is not the double ``0.3``.

    Returns one row per (probe, step): ``probe_id, id, step (1..k),
    rel`` (the rounded cosine from stage 1) and ``mmr_score``.
    """
    from pyspark.sql import Window

    base = batch_topk(
        df,
        probes,
        k=shortlist,
        salt_buckets=salt_buckets,
        id_col=id_col,
        vec_col=vec_col,
        probe_id_col=probe_id_col,
    )
    unit = _unit_project(df, F.col(vec_col), "_uv", [F.col(id_col)])
    # bounded: probes x shortlist rows with their unit vectors; the
    # eager localCheckpoint truncates lineage so the greedy iterations
    # below reference a materialized tiny relation instead of
    # re-running the corpus scan ~3^k times (plan-reuse blowup of the
    # recursive union) — same discipline as the iterative graph ops.
    cand = (
        base.select(probe_id_col, id_col, F.col("cosine_sim").alias("rel"))
        .join(unit, id_col)
        .localCheckpoint()
    )
    a = cand.select(
        probe_id_col, F.col(id_col).alias("_ia"), F.col("_uv").alias("_va")
    )
    b = cand.select(
        probe_id_col, F.col(id_col).alias("_ib"), F.col("_uv").alias("_vb")
    )
    psim = (
        a.join(b, probe_id_col)
        .where(F.col("_ia") != F.col("_ib"))
        .select(
            probe_id_col,
            "_ia",
            "_ib",
            F.round(dot(F.col("_va"), F.col("_vb")), 4).alias("_sim"),
        )
        .localCheckpoint()
    )
    slim = cand.select(probe_id_col, id_col, "rel")
    w = Window.partitionBy(probe_id_col).orderBy(
        F.desc("_score"), F.asc(id_col)
    )
    sel = (
        slim.withColumn("_score", F.round(F.lit(lam) * F.col("rel"), 6))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            probe_id_col,
            id_col,
            "rel",
            F.col("_score").alias("mmr_score"),
            F.lit(1).alias("step"),
        )
    )
    for step in range(2, k + 1):
        chosen = sel.select(probe_id_col, F.col(id_col).alias("_ib"))
        maxsim = (
            psim.join(chosen, [probe_id_col, "_ib"])
            .groupBy(probe_id_col, "_ia")
            .agg(F.max("_sim").alias("_maxsim"))
            .withColumnRenamed("_ia", id_col)
        )
        pick = (
            slim.join(
                sel.select(probe_id_col, id_col),
                [probe_id_col, id_col],
                "left_anti",
            )
            .join(maxsim, [probe_id_col, id_col])
            .withColumn(
                "_score",
                F.round(
                    F.lit(lam) * F.col("rel")
                    - F.lit(penalty) * F.col("_maxsim"),
                    6,
                ),
            )
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select(
                probe_id_col,
                id_col,
                "rel",
                F.col("_score").alias("mmr_score"),
                F.lit(step).alias("step"),
            )
        )
        # checkpoint the accumulated selection each step: without it
        # the recursive union re-executes every prior step's joins and
        # windows ~3^k times (measured 26 s -> ~8 s at sf0.01); each
        # checkpoint is a probes x step-row job.
        sel = sel.unionByName(pick).localCheckpoint()
    return sel.select(probe_id_col, id_col, "step", "rel", "mmr_score")


def probe_row(
    df: DataFrame,
    probe_id: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    require: bool = False,
) -> DataFrame:
    """The query vector as a 1-ROW DATAFRAME (column ``_pv``) instead of
    a driver-side list.

    Broadcast-crossJoined onto the corpus scan it folds into the query
    plan exactly like the repo's 1-row scalar-agg pattern, so an ANN
    query whose probe comes from a table runs as ONE job — no eager
    ``.first()`` sniff before plan construction (round-6: the plan
    layer now rides this for every registered ANN query; the
    list-parameter variants remain for callers that already hold the
    vector, which IS the production retrieval shape).

    EMPTY-PROBE CONTRACT (ADVICE r6): a ``probe_id`` absent from ``df``
    yields a 0-row relation, and every downstream crossJoin-based query
    then returns 0 rows — silently, which is correct relational algebra
    but a foot-gun when the id was a typo. Pass ``require=True`` to
    fail loudly instead: it runs ONE key-pushdown count (a bounded,
    footer-pruned scan) and raises KeyError on a missing id. The
    registered queries stay on the lazy default because their probe ids
    are fixture constants verified by the oracle twin.
    """
    # limit(1) makes the 1-row contract STRUCTURAL (a GlobalLimit in
    # the plan) rather than an id-uniqueness convention: the broadcast
    # this feeds is then provably bounded to any plan audit (the
    # forced-broadcast scale rule, round 12), and Spark itself gets a
    # hard cardinality bound. id_col is unique, so the row is the same.
    out = (
        df.where(F.col(id_col) == probe_id)
        .select(as_double(F.col(vec_col)).alias("_pv"))
        .limit(1)
    )
    if require and out.limit(1).count() == 0:
        raise KeyError(
            f"probe_row: no row with {id_col} == {probe_id!r} — downstream "
            "ANN queries would silently return 0 rows"
        )
    return out


def brute_force_topk_df(
    df: DataFrame,
    probe: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """:func:`brute_force_topk` with the query folded in as a broadcast
    1-row relation (:func:`probe_row`): map-only scan + TakeOrdered(k),
    fully lazy, single job."""
    c = df.select(F.col(id_col), as_double(F.col(vec_col)).alias("_cv"))
    return (
        c.crossJoin(F.broadcast(probe))
        .select(
            F.col(id_col),
            F.round(cosine(F.col("_cv"), F.col("_pv")), 4).alias("cosine_sim"),
        )
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


def _planes_matrix(dim: int, n_planes: int, n_tables: int):
    """All t*b hyperplanes as a (n_tables*n_planes, dim) numpy matrix,
    table-major, from the same deterministic mix as :func:`_hyperplane`."""
    return np.array(
        [_hyperplane(dim, p, t) for t in range(n_tables) for p in range(n_planes)],
        dtype=np.float64,
    )


def _pack_signs(signs, n_planes: int, n_tables: int):
    """(n, t*b) sign bools -> (n, t) int64 bucket ids (bit j = plane j)."""
    pow2 = (np.int64(1) << np.arange(n_planes, dtype=np.int64))
    return signs.reshape(-1, n_tables, n_planes).astype(np.int64) @ pow2


def srp_buckets_udf(dim: int, n_planes: int, n_tables: int):
    """Arrow-batched Pandas UDF: embedding -> array<bigint> of one SRP
    bucket id per hash table.

    Why a Pandas UDF here and not the expression path used by
    :func:`srp_bucket`: OR-amplification needs t*b plane projections per
    row (e.g. 25 tables x 5 planes = 125 dot products). As 125 nested
    ``aggregate(zip_with(...))`` expressions that blows past the JIT
    method budget and drops out of whole-stage codegen; as one numpy
    ``V @ P.T`` matmul over an Arrow batch it is a single BLAS call.
    Deterministic: the planes come from the same integer mix the
    driver uses for query buckets.
    """
    from pyspark.sql.functions import pandas_udf

    planes_t = _planes_matrix(dim, n_planes, n_tables).T  # (dim, t*b)

    @pandas_udf("array<bigint>")
    def buckets(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype=object)
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
        packed = _pack_signs(mat @ planes_t > 0, n_planes, n_tables)
        return pd.Series(list(packed))

    # The function IS deterministic (fixed integer-mix hyperplanes), but
    # it is declared non-deterministic so the optimizer may not duplicate
    # it: every caller explodes or filters on the result, and the pushed
    # null/size filter otherwise lands BELOW a second copy of the UDF —
    # two ArrowEvalPython nodes per scan, each corpus row paying the
    # (dim x t*b) matmul twice (the guide's filter-duplication pattern).
    # Measured on the capped near-dup query at sf0.1: ~2x end to end.
    return buckets.asNondeterministic()


def _query_buckets(query_vec: list[float], n_planes: int, n_tables: int) -> list[int]:
    """Driver-side bucket ids for the query vector (same mix as the UDF)."""
    planes = _planes_matrix(len(query_vec), n_planes, n_tables)
    signs = planes @ np.asarray(query_vec, dtype=np.float64) > 0
    return [int(b) for b in _pack_signs(signs.reshape(1, -1), n_planes, n_tables)[0]]


def srp_params(
    threshold: float, target_recall: float = 0.95, max_tables: int = 32
) -> tuple[int, int]:
    """Auto-tune (n_planes b, n_tables t) for OR-amplified SRP-LSH.

    For cosine threshold s, a single hyperplane agrees on both sides of
    a pair with p = 1 - arccos(s)/pi; a b-bit table catches the pair
    with p^b and t OR'd tables with 1 - (1-p^b)^t. Pick the largest b
    (smallest buckets => fewest candidate pairs) whose required
    t = ceil(ln(1-recall)/ln(1-p^b)) fits in max_tables. Larger b is
    what keeps the candidate join sub-quadratic at 100 TB; t only
    multiplies the (ids-only) explode, not the corpus shuffle.
    """
    p = 1.0 - math.acos(max(-1.0, min(1.0, threshold))) / math.pi
    for b in range(16, 1, -1):
        pb = p**b
        if pb >= 1.0:
            continue
        t = math.ceil(math.log(1.0 - target_recall) / math.log(1.0 - pb))
        if t <= max_tables:
            return b, t
    return 2, max_tables


def srp_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
    n_tables: int = 16,
    multiprobe: int = 1,
) -> DataFrame:
    """ANN top-k: exact scan restricted to rows sharing an SRP bucket
    with the query in ANY of ``n_tables`` hash tables (OR-amplification),
    additionally probing buckets within Hamming distance ``multiprobe``
    of the query bucket per table.

    Map-only: the bucket filter is a per-row predicate against t query
    bucket literals — no shuffle, no index build. Recall per neighbor at
    cosine s is 1-(1-P_hit)^t with P_hit = sum_{i<=multiprobe} C(b,i)
    p^(b-i) (1-p)^i, p = 1-arccos(s)/pi; candidate volume is
    ~t*(1+b*multiprobe)/2^b of the corpus. Defaults (b=12, t=16,
    probe<=1) scan ~5% of the corpus with recall ~0.94 for s>=0.7
    neighbors. Approximate by design; tests/test_similarity_srp.py pins
    recall@k against :func:`brute_force_topk`.
    """
    dim = len(query_vec)
    buckets = srp_buckets_udf(dim, n_planes, n_tables)
    qb = _query_buckets(query_vec, n_planes, n_tables)
    qb_lit = F.array(*[F.lit(b).cast("bigint") for b in qb])
    hit = F.exists(
        F.zip_with(
            F.col("_buckets"),
            qb_lit,
            lambda a, b: F.bit_count(a.bitwiseXOR(b)) <= F.lit(multiprobe),
        ),
        lambda x: x,
    )
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = cosine(as_double(F.col(vec_col)), q)
    return (
        df.withColumn("_buckets", buckets(F.col(vec_col)))
        .where(hit)
        .select(F.col(id_col), F.round(sim, 4).alias("cosine_sim"))
        .orderBy(F.desc("cosine_sim"), F.asc(id_col))
        .limit(k)
    )


def srp_topk_df(
    df: DataFrame,
    probe: DataFrame,
    dim: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
    n_tables: int = 16,
    multiprobe: int = 1,
) -> DataFrame:
    """:func:`srp_topk` with the probe as a 1-row DataFrame
    (:func:`probe_row`): the query's t bucket ids are computed by the
    SAME Arrow-batched projection UDF the corpus uses (over one row),
    broadcast along with the vector, and the per-row candidate test is
    a zip_with Hamming check between the two bucket arrays. The whole
    query is one lazy job — nothing is fetched to the driver to build
    the plan. ``dim`` is a plan-time constant (the planes matrix
    exists before any data moves); pass the table's known embedding
    width."""
    buckets = srp_buckets_udf(dim, n_planes, n_tables)
    p = probe.select(F.col("_pv"), buckets(F.col("_pv")).alias("_pb"))
    hit = F.exists(
        F.zip_with(
            F.col("_buckets"),
            F.col("_pb"),
            lambda a, b: F.bit_count(a.bitwiseXOR(b)) <= F.lit(multiprobe),
        ),
        lambda x: x,
    )
    return (
        df.select(F.col(id_col), as_double(F.col(vec_col)).alias("_cv"))
        .withColumn("_buckets", buckets(F.col("_cv")))
        .crossJoin(F.broadcast(p))
        .where(hit)
        .select(
            F.col(id_col),
            F.round(cosine(F.col("_cv"), F.col("_pv")), 4).alias("cosine_sim"),
        )
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

    The 100 TB layout is :func:`ivf_build_index` + :func:`ivf_query_index`:
    fit the quantizer once, write the corpus ``partitionBy(cell)``, and
    each query prunes to n_probe/n_cells of the data via planning-time
    partition pruning. Here the cell assignment is computed on the fly
    (same plan shape minus the pruning I/O win). Approximate by design —
    recall depends on (n_cells, n_probe); compare against
    :func:`brute_force_topk` (pinned in tests/test_similarity_ivf.py).
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


def ivf_topk_df(
    df: DataFrame,
    probe: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """:func:`ivf_topk` with the probe as a 1-row DataFrame
    (:func:`probe_row`): the KMeans fit stays the only eager step
    (model fitting is inherently iterative); probe-cell selection moves
    INSIDE the plan — the (n_cells × dim, tiny) centroid table becomes
    a literal relation crossJoined with the broadcast probe, ranked by
    squared distance, and the top ``n_probe`` cells semi-join the cell
    assignments. The query vector never surfaces on the driver."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = df.withColumn("_feat", array_to_vector(as_double(F.col(vec_col))))
    km = KMeans(
        k=n_cells, seed=seed, maxIter=5, featuresCol="_feat", predictionCol="_cell"
    )
    model = km.fit(feats.select("_feat"))
    cents = df.sparkSession.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cell int, centroid array<double>",
    )
    d2 = F.aggregate(
        F.zip_with(F.col("centroid"), F.col("_pv"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    top_cells = (
        cents.crossJoin(F.broadcast(probe))
        .select("cell", d2.alias("_d2"))
        .orderBy(F.asc("_d2"), F.asc("cell"))
        .limit(n_probe)
        .select("cell")
    )
    cand = model.transform(feats).join(
        F.broadcast(top_cells), F.col("_cell") == F.col("cell"), "left_semi"
    )
    return brute_force_topk_df(cand, probe, k=k, id_col=id_col, vec_col=vec_col)


def ivf_build_index(
    df: DataFrame,
    index_path: str,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> None:
    """Materialize the IVF layout :func:`ivf_topk`'s docstring promises:
    fit the KMeans coarse quantizer, assign every vector a cell, and
    write the corpus ``partitionBy(cell)``.

    At 100 TB this is the index build (one pass + one shuffle on cell);
    afterwards every query opens only n_probe/n_cells of the files via
    PLANNING-time partition pruning — tests/test_similarity_ivf.py
    asserts the ``PartitionFilters`` in the query scan's physical plan.

    Centroids (n_cells × dim doubles — tiny) are written under
    ``_centroids``; the underscore prefix keeps the dir invisible to
    the partitioned table scan.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = df.withColumn("_feat", array_to_vector(as_double(F.col(vec_col))))
    km = KMeans(k=n_cells, seed=seed, maxIter=5, featuresCol="_feat", predictionCol="cell")
    model = km.fit(feats.select("_feat"))
    assigned = model.transform(feats).drop("_feat")
    assigned.write.mode("overwrite").partitionBy("cell").parquet(index_path)
    spark = df.sparkSession
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cell int, centroid array<double>",
    )
    centroids.coalesce(1).write.mode("overwrite").parquet(f"{index_path}/_centroids")


def ivf_index_append(
    spark: SparkSession,
    index_path: str,
    batch: DataFrame,
    vec_col: str = "embedding",
) -> None:
    """Incremental IVF maintenance: assign a NEW batch of vectors to
    the EXISTING centroids and append into the partitioned layout —
    O(batch) daily ingest, the IVF twin of the minhash incremental
    index (operators/dedup.py).

    The assignment is pure Column algebra: squared distance to each of
    the (bounded, by construction) centroids as an array literal,
    argmin via array_position(array_min) — ties break to the LOWEST
    cell id, deterministically. Existing partitions are untouched (the
    append lands only in the batch's cells); queries see the union
    immediately. No re-fit: centroid drift accumulates until a
    periodic :func:`ivf_build_index` re-balance, the standard
    IVF-serving tradeoff.
    """
    cents = sorted(
        spark.read.parquet(f"{index_path}/_centroids").collect(),
        key=lambda r: r["cell"],
    )
    v = as_double(F.col(vec_col))
    d2s = [
        F.aggregate(
            F.zip_with(
                v,
                F.array(*[F.lit(float(x)) for x in r["centroid"]]),
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        for r in cents
    ]
    arr = F.array(*d2s)
    cell = (F.array_position(arr, F.array_min(arr)) - 1).cast("int")
    batch.withColumn("cell", cell).write.mode("append").partitionBy(
        "cell"
    ).parquet(index_path)


def ivf_query_index(
    spark: SparkSession,
    index_path: str,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k against an :func:`ivf_build_index` layout.

    Probe cells are chosen driver-side from the (tiny) centroid table;
    the corpus scan carries ``cell IN (probes)`` — a partition-column
    predicate Spark resolves at planning time, so unmatched partitions
    are never listed, opened, or scheduled.
    """
    centroids = spark.read.parquet(f"{index_path}/_centroids").collect()
    dists = [
        (r["cell"], sum((c - q) ** 2 for c, q in zip(r["centroid"], query_vec)))
        for r in centroids
    ]
    probe = [cell for cell, _ in sorted(dists, key=lambda t: t[1])[:n_probe]]
    cand = spark.read.parquet(index_path).where(F.col("cell").isin(probe))
    return brute_force_topk(cand, query_vec, k=k, id_col=id_col, vec_col=vec_col)


def ivf_query_index_df(
    spark: SparkSession,
    index_path: str,
    probe: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    where: Column | None = None,
) -> DataFrame:
    """ANN top-k against an :func:`ivf_build_index` layout with the
    probe as a 1-row DataFrame (:func:`probe_row`), optionally composed
    with a metadata predicate ``where`` — the production vector-store
    query shape: "nearest neighbors WHERE label = X".

    Cell selection: the centroid table is bounded at n_cells rows BY
    CONSTRUCTION, so ranking it against the broadcast probe and
    collecting the ``n_probe`` winning cell ids is a fixed-size driver
    step — the deliberate price of a PLANNING-TIME ``cell IN (...)``
    partition predicate, which prunes unmatched index partitions
    before any file is listed, opened, or scheduled (``PartitionFilters``
    in the scan; pinned in tests/test_plans.py). The metadata predicate
    lands in the SAME pruned scan as a pushed data filter — pre-filter,
    not post-filter, so a selective predicate cannot starve the top-k
    the way post-filtering a global shortlist can.
    """
    cents = spark.read.parquet(f"{index_path}/_centroids")
    d2 = F.aggregate(
        F.zip_with(F.col("centroid"), F.col("_pv"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cells = [
        r["cell"]
        for r in cents.crossJoin(F.broadcast(probe))
        .select("cell", d2.alias("_d2"))
        .orderBy(F.asc("_d2"), F.asc("cell"))
        .limit(n_probe)
        .collect()
    ]
    scan = spark.read.parquet(index_path).where(F.col("cell").isin(cells))
    if where is not None:
        scan = scan.where(where)
    return brute_force_topk_df(scan, probe, k=k, id_col=id_col, vec_col=vec_col)


def cosine_near_duplicates(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int | None = None,
    n_tables: int | None = None,
    target_recall: float = 0.95,
    max_tables: int = 32,
    dim: int | None = None,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via OR-amplified SRP-LSH
    blocking + exact cosine verification.

    (b, t) default to :func:`srp_params`(threshold, target_recall) —
    a single b-bit table catches a threshold-sim pair with only
    p^b (~7% at s=0.45, b=6: the round-1 recall collapse); t OR'd
    tables lift that to 1-(1-p^b)^t >= target_recall.
    tests/test_similarity_srp.py pins recall against the exact
    all-pairs twin.

    100 TB plan shape:

    - Buckets per row come from one Arrow-batched numpy matmul
      (:func:`srp_buckets_udf`) — t*b plane projections as nested
      codegen aggregates would blow the JIT method budget.
    - The t-way posexplode carries ONLY (id, bucket array, table,
      bucket) — never the vectors. Exploding vectors would shuffle t
      copies of the corpus (t=25 => 2.5 PB of shuffle on a 100 TB
      corpus); the t-bucket array is ~8t bytes/row.
    - ``shuffle_hash`` hints on the (table, bucket) self-join: both
      sides are the SAME exchange and Spark reuses it (ReusedExchange);
      a broadcast self-join would compute the bucketed projection twice
      and cannot broadcast a corpus-sized side anyway.
    - Candidate dedup is a MAP-SIDE first-collision filter, not a
      ``distinct`` shuffle: both sides carry their full bucket arrays,
      and a pair surviving the join in table i is kept only when no
      earlier table j<i also collided. Each unique pair exits the join
      exactly once — removing what was the plan's largest exchange
      (the multi-collided candidate set).
    - L2 norms are materialized per row before the pair join, so
      verification is one dot product per unique pair.
    - ``max_bucket_size`` is the hot-bucket guardrail (VERDICT r6): per
      bucket the candidate join is QUADRATIC in bucket population, so a
      degenerate embedding region (a mode-collapsed encoder, a burst of
      near-constant vectors — or uniform synthetic data at a loose
      threshold) silently turns the blocked plan back into ~all-pairs.
      With the cap set, oversized (table, bucket) groups are keymod-
      sampled down to ~max_bucket_size members BEFORE the self-join
      (the same explicit-exclusion discipline as the fuzzy-join
      FUZZY_MAX_BLOCK and the shingle df cap), bounding per-bucket pair
      work at ~cap²/2. Sampling is PER (table, bucket): the keymod is
      ``xxhash64(id) % ceil(size/cap)``, so the modulus varies with each
      oversized bucket's population and a row may survive in one of its
      tables while being dropped in another (keying on the id rather
      than (id, table) merely keeps the kept set consistent among
      buckets that happen to share a modulus). Per-bucket moduli are
      deliberate: each oversized bucket retains ~cap members instead of
      being thinned by the globally-worst bucket's ratio. The map-side
      first-collision dedup assumes every earlier-table collision
      actually joined, which sampling breaks — the capped path dedups
      candidates with a ``dropDuplicates`` shuffle instead, acceptable
      BECAUSE the cap has just bounded the candidate volume. Recall within a hot bucket
      degrades to ~(cap/size)² of its pairs — the explicit, reported
      (:func:`srp_bucket_profile`) price of bounded work; pairs in
      healthy buckets are unaffected.
    """
    if n_planes is None:
        n_planes, auto_t = srp_params(threshold, target_recall, max_tables)
        n_tables = auto_t if n_tables is None else n_tables
    elif n_tables is None:
        n_tables = 1
    if dim is None:
        # Array columns don't carry their length in the schema, and an
        # eager .first() probe here (the round-1..6 fallback) was the
        # operator's only non-lazy action — callers always know their
        # embedding width (VERDICT r6 item 7).
        raise ValueError(
            "cosine_near_duplicates requires dim= (the embedding width); "
            "an automatic schema probe would run an eager job per call"
        )
    buckets = srp_buckets_udf(dim, n_planes, n_tables)
    base = df.select(
        F.col(id_col).alias("_id"), as_double(F.col(vec_col)).alias("_v")
    ).withColumn("_norm", l2_norm(F.col("_v")))
    ids = df.select(
        F.col(id_col).alias("_id"),
        buckets(F.col(vec_col)).alias("_bkts"),
    ).select(
        "_id", "_bkts", F.posexplode(F.col("_bkts")).alias("_tbl", "_bkt")
    )
    if max_bucket_size is not None:
        # (table, bucket) populations: grouped on the SAME key the
        # self-join shuffles on; output is at most t * 2^b rows (AQE
        # broadcasts it when small). A row in an oversized bucket
        # survives with probability ~cap/size via a deterministic
        # keymod on its id — no RNG, rerun-stable.
        sizes = ids.groupBy("_tbl", "_bkt").agg(F.count("*").alias("_sz"))
        ids = (
            ids.join(sizes, ["_tbl", "_bkt"])
            .where(
                (F.col("_sz") <= max_bucket_size)
                | (
                    F.pmod(
                        F.xxhash64("_id"),
                        F.ceil(
                            F.col("_sz") / F.lit(max_bucket_size)
                        ).cast("bigint"),
                    )
                    == 0
                )
            )
            .drop("_sz")
        )
    l, r = ids.alias("l"), ids.alias("r")
    join_on = (
        (F.col("l._tbl") == F.col("r._tbl"))
        & (F.col("l._bkt") == F.col("r._bkt"))
        & (F.col("l._id") < F.col("r._id"))
    )
    if max_bucket_size is None:
        # keep a colliding pair only in its FIRST colliding table: exact
        # dedup with zero extra shuffle (sequence(0, -1) is descending in
        # Spark, so table 0 needs the explicit guard)
        first_collision = F.when(F.col("l._tbl") == 0, F.lit(True)).otherwise(
            ~F.exists(
                F.sequence(F.lit(0), F.col("l._tbl") - 1),
                lambda j: F.element_at(F.col("l._bkts"), (j + 1).cast("int"))
                == F.element_at(F.col("r._bkts"), (j + 1).cast("int")),
            )
        )
        cand = (
            l.hint("shuffle_hash")
            .join(r.hint("shuffle_hash"), join_on)
            .where(first_collision)
            .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
        )
    else:
        cand = (
            l.hint("shuffle_hash")
            .join(r.hint("shuffle_hash"), join_on)
            .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
            .dropDuplicates(["id_a", "id_b"])
        )
    pairs = cand.join(
        base.select(
            F.col("_id").alias("id_a"), F.col("_v").alias("_va"), F.col("_norm").alias("_na")
        ),
        "id_a",
    ).join(
        base.select(
            F.col("_id").alias("id_b"), F.col("_v").alias("_vb"), F.col("_norm").alias("_nb")
        ),
        "id_b",
    )
    cos = dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb"))
    return (
        pairs.select(
            F.col("id_a"), F.col("id_b"), F.round(cos, 4).alias("cosine_sim")
        )
        .where(F.col("cosine_sim") >= threshold)
    )


def srp_bucket_profile(
    df: DataFrame,
    dim: int,
    n_planes: int,
    n_tables: int,
    max_bucket_size: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-(table, bucket) population report for the SRP-LSH family —
    the "report what was dropped" companion to
    :func:`cosine_near_duplicates`'s ``max_bucket_size`` cap.

    Returns ``(table, bucket, size, capped, kept_expected)`` sorted by
    descending size: ``capped`` marks buckets past the bound, and
    ``kept_expected`` is the ~population the keymod sample retains
    there. Run it (or its agg) alongside a capped dedup to quantify the
    recall trade: sum(size) vs sum(kept_expected) over capped buckets.
    One groupBy on the explode — no pair join, safe at any skew.
    """
    buckets = srp_buckets_udf(dim, n_planes, n_tables)
    sizes = (
        df.select(buckets(F.col(vec_col)).alias("_bkts"))
        .select(F.posexplode("_bkts").alias("table", "bucket"))
        .groupBy("table", "bucket")
        .agg(F.count("*").alias("size"))
    )
    cap = F.lit(max_bucket_size) if max_bucket_size is not None else None
    if cap is None:
        out = sizes.select(
            "table", "bucket", "size",
            F.lit(False).alias("capped"),
            F.col("size").alias("kept_expected"),
        )
    else:
        out = sizes.select(
            "table",
            "bucket",
            "size",
            (F.col("size") > cap).alias("capped"),
            F.when(F.col("size") <= cap, F.col("size"))
            .otherwise(
                F.floor(F.col("size") / F.ceil(F.col("size") / cap))
            )
            .cast("bigint")
            .alias("kept_expected"),
        )
    return out.orderBy(F.desc("size"), F.asc("table"), F.asc("bucket"))


def srp_index_build(
    df: DataFrame,
    path: str,
    dim: int,
    n_planes: int = 12,
    n_tables: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist the SRP-LSH dedup index — the cosine-family twin of
    operators/dedup.py:minhash_index_build, closing the incremental
    story for the third dedup family: ``{path}/buckets`` = (id, the t
    per-table bucket ids) and ``{path}/vectors`` = (id, vector, norm)
    for exact verification.

    Daily embedding ingest then stays O(batch): corpus projections (the
    Arrow matmul, the expensive part) are computed ONCE here; each new
    batch hashes only itself and joins the persisted buckets
    (:func:`srp_dedup_incremental`). The hash family is deterministic
    (:func:`_hyperplane`), so the same (dim, n_planes, n_tables) at
    query time reproduces build-time buckets exactly — the index's
    contract, like minhash's band parameters.
    """
    buckets = srp_buckets_udf(dim, n_planes, n_tables)
    df.select(
        F.col(id_col), buckets(F.col(vec_col)).alias("bkts")
    ).write.mode("overwrite").parquet(f"{path}/buckets")
    df.select(
        F.col(id_col), as_double(F.col(vec_col)).alias("v")
    ).withColumn("norm", l2_norm(F.col("v"))).write.mode(
        "overwrite"
    ).parquet(f"{path}/vectors")


def srp_index_append(
    batch: DataFrame,
    path: str,
    dim: int,
    n_planes: int = 12,
    n_tables: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Append an ingested batch to a persisted SRP index built by
    :func:`srp_index_build` — the maintenance half of the streaming
    ingest loop: once a batch has been deduped against the index
    (:func:`srp_dedup_incremental`), appending it makes every LATER
    batch see it, so cross-batch pairs surface exactly once.

    O(batch): hashes and writes only the batch (parquet append = new
    files, no rewrite of the existing index). The (dim, n_planes,
    n_tables) MUST match the build — the hyperplane family is
    deterministic in those parameters, and a mismatched append would
    silently put batch vectors in a different hash space (the same
    contract-mismatch class ivfpq_index_append guards; here the
    parameters are caller-held rather than persisted, matching
    srp_dedup_incremental's existing contract).
    """
    buckets = srp_buckets_udf(dim, n_planes, n_tables)
    batch.select(
        F.col(id_col), buckets(F.col(vec_col)).alias("bkts")
    ).write.mode("append").parquet(f"{path}/buckets")
    batch.select(
        F.col(id_col), as_double(F.col(vec_col)).alias("v")
    ).withColumn("norm", l2_norm(F.col("v"))).write.mode("append").parquet(
        f"{path}/vectors"
    )


def srp_index_compact(
    spark,
    path: str,
    target_file_bytes: int = 32 * 1024 * 1024,
    max_files: int | None = None,
) -> int:
    """Compact a streamed-into SRP index's small files — the cosine
    twin of ``dedup.minhash_index_compact``: per-trigger
    ``srp_index_append`` writes accumulate until listing + footer
    reads dominate the per-batch probe's planning time. Runs
    ``layout.compact_files`` (staged rewrite, rename swap,
    crash-recoverable) on the buckets and vectors dirs; quiesce the
    ingest stream for the swap. Returns the new total file count.
    Dedup results are exactly unchanged — pinned in
    tests/test_similarity_batch.py.
    """
    from etl_mudah_spark.operators.layout import compact_files

    n = compact_files(
        spark, f"{path}/buckets", target_file_bytes, max_files=max_files
    )
    n += compact_files(
        spark, f"{path}/vectors", target_file_bytes, max_files=max_files
    )
    return n


def srp_dedup_incremental(
    spark: SparkSession,
    batch: DataFrame,
    index_path: str,
    dim: int,
    threshold: float = 0.45,
    n_planes: int = 12,
    n_tables: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    include_batch_pairs: bool = True,
) -> DataFrame:
    """Cosine near-duplicate pairs of a NEW batch against an indexed
    corpus, never re-projecting corpus vectors.

    Returns ``(id_a, id_b, cosine_sim >= threshold)`` with id_a the
    corpus vector and id_b the batch vector; with
    ``include_batch_pairs`` the batch's internal pairs union in.
    Self-pairs from re-ingested ids (batch ∩ corpus) are filtered, but
    orientation is SEMANTIC, not canonical: when an overlapping ingest
    makes the same logical pair reachable both as corpus-batch and as
    an internal batch pair, both orientations appear — normalize with
    least/greatest if set semantics are needed (as the parity test
    does).
    Because the hyperplanes are deterministic, the result EXACTLY
    equals the pairs of a from-scratch
    :func:`cosine_near_duplicates` run over corpus ∪ batch that touch
    the batch (pinned in tests/test_similarity_batch.py) — same
    candidates, same verification, none of the corpus-side recompute.

    Scale: batch buckets shuffle on (table, bucket) against the
    persisted bucket files; the first-collision filter dedups
    candidates map-side exactly like the self-join path; verification
    reads only the candidate ids' vector rows.
    """
    buckets = srp_buckets_udf(dim, n_planes, n_tables)
    nb = batch.select(
        F.col(id_col).alias("_bid"), buckets(F.col(vec_col)).alias("_bbkts")
    ).select(
        "_bid", "_bbkts", F.posexplode("_bbkts").alias("_tbl", "_bkt")
    )
    cx = (
        spark.read.parquet(f"{index_path}/buckets")
        .select(F.col(id_col).alias("_cid"), F.col("bkts").alias("_cbkts"))
        .select("_cid", "_cbkts", F.posexplode("_cbkts").alias("_tbl", "_bkt"))
    )
    first_collision = F.when(F.col("_tbl") == 0, F.lit(True)).otherwise(
        ~F.exists(
            F.sequence(F.lit(0), F.col("_tbl") - 1),
            lambda j: F.element_at(F.col("_cbkts"), (j + 1).cast("int"))
            == F.element_at(F.col("_bbkts"), (j + 1).cast("int")),
        )
    )
    # shuffle_hash kept after a round-14 A/B: dropping the hints to let
    # the planner broadcast the small batch side measured WORSE in the
    # streaming ingest loop ({17.4-17.7}s vs {10.6-11.5}s per x10 drain
    # band) — the static planner broadcasts/SMJs unpredictably here, and
    # a forced broadcast of the batch would be an unbounded-relation
    # hint (the scale audit's OOM-by-hint class). The corpus-side
    # shuffle this keeps is index-bucket rows (ids + 8t bytes), never
    # vectors.
    cand = (
        cx.hint("shuffle_hash")
        .join(nb.hint("shuffle_hash"), ["_tbl", "_bkt"])
        .where(first_collision)
        # a re-ingested id (batch ∩ corpus) collides with itself in
        # every table — a meaningless (x, x, 1.0) self-pair (ADVICE r6)
        .where(F.col("_cid") != F.col("_bid"))
        .select("_cid", "_bid")
    )
    vc = spark.read.parquet(f"{index_path}/vectors").select(
        F.col(id_col).alias("_cid"),
        F.col("v").alias("_va"),
        F.col("norm").alias("_na"),
    )
    vb = batch.select(
        F.col(id_col).alias("_bid"),
        as_double(F.col(vec_col)).alias("_vb"),
    ).withColumn("_nb", l2_norm(F.col("_vb")))
    cos = dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb"))
    cross = (
        cand.join(vc, "_cid")
        .join(vb, "_bid")
        .select(
            F.col("_cid").alias("id_a"),
            F.col("_bid").alias("id_b"),
            F.round(cos, 4).alias("cosine_sim"),
        )
        .where(F.col("cosine_sim") >= threshold)
    )
    if include_batch_pairs:
        internal = cosine_near_duplicates(
            batch,
            threshold=threshold,
            id_col=id_col,
            vec_col=vec_col,
            n_planes=n_planes,
            n_tables=n_tables,
            dim=dim,
        )
        cross = cross.unionByName(internal)
    return cross


# ---------------------------------------------------------------------------
# Product quantization (PQ) ANN
# ---------------------------------------------------------------------------
def pq_train_codebooks(
    df: DataFrame,
    m: int = 4,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_mod: int | None = None,
    iters: int = 15,
    normalize: bool = True,
) -> np.ndarray:
    """Train PQ codebooks: split each L2-normalized vector into ``m``
    subvectors and run k-means (``k`` centroids) per subspace on a
    deterministic corpus sample. ``normalize=False`` trains on the raw
    values — the IVF-PQ residual path (:func:`ivfpq_build_index`),
    where the input is ALREADY a residual against a coarse centroid
    and re-normalizing would distort the geometry being quantized.

    PQ training is ALWAYS on a sample (the codebook is a few KB; fitting
    it needs thousands of points, not the corpus) — ``sample_mod``
    keymod-samples like operators/sampling.py, so the sample and hence
    the codebook are reproducible, no RNG. The default (None) sizes the
    modulus from the corpus count to cap the driver collect at ~8k
    vectors — codebook quality saturates far below that, and an
    unbounded collect is a driver OOM at scale. COST NOTE (VERDICT r6
    item 7): that default runs one extra full ``df.count()`` job
    before training — pass ``sample_mod`` explicitly when the corpus
    size is already known; registered queries reuse their counts.

    The keymod rule assumes ``id_col`` is a roughly DENSE integer
    sequence (the testdata contract): for sparse or clustered id
    spaces ``id % mod == 0`` can select far fewer rows than intended,
    so the sample size is validated below — pass ``sample_mod``
    explicitly (e.g. 1) for non-dense ids. Lloyd iterations run in
    numpy on the driver; init is evenly-spaced sample points in id
    order (deterministic, k-means++-free). Returns ``(m, k, dim/m)``.
    """
    if sample_mod is None:
        sample_mod = max(1, df.count() // 8192)
    rows = (
        df.where(F.col(id_col) % sample_mod == 0)
        .select(id_col, as_double(F.col(vec_col)).alias("v"))
        .orderBy(id_col)
        .collect()
    )
    if len(rows) < k:
        raise ValueError(
            f"PQ training sample has {len(rows)} vectors < k={k} centroids "
            f"(sample_mod={sample_mod}). The default keymod sampling "
            f"assumes {id_col!r} is a dense integer sequence — for sparse "
            "or offset id spaces pass sample_mod explicitly (sample_mod=1 "
            "trains on every row)."
        )
    x = np.array([r["v"] for r in rows], dtype=np.float64)
    if normalize:
        x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    n, dim = x.shape
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    books = np.empty((m, k, sub))
    for i in range(m):
        xs = x[:, i * sub : (i + 1) * sub]
        cents = xs[np.linspace(0, n - 1, k).astype(int)].copy()
        for _ in range(iters):
            d2 = ((xs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(k):
                pts = xs[assign == c]
                if len(pts):
                    cents[c] = pts.mean(axis=0)
        books[i] = cents
    return books


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: list[str] | None = None,
    normalize: bool = True,
) -> DataFrame:
    """Encode every vector to ``m`` one-byte-ish codes (nearest centroid
    per subspace, after L2 normalization; ``normalize=False`` for the
    IVF-PQ residual path, matching :func:`pq_train_codebooks`).

    Python is justified here: the argmin over (m × k) centroids has no
    codegen expression form that doesn't explode to m·k aggregate
    calls. It's an Arrow-batched pandas_udf doing one numpy einsum per
    batch — the 100 TB index build is a single map pass writing
    ~m bytes/vector (16-32x compression at 64 dims).
    """
    from pyspark.sql.functions import pandas_udf

    books = codebooks  # closure → serialized once per task, not per row
    m, k, sub = books.shape

    do_norm = normalize

    @pandas_udf("array<int>")
    def codes(vs: pd.Series) -> pd.Series:
        x = np.array(vs.tolist(), dtype=np.float64)
        if do_norm:
            x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        out = np.empty((len(x), m), dtype=np.int32)
        for i in range(m):
            xs = x[:, i * sub : (i + 1) * sub]
            d2 = ((xs[:, None, :] - books[i][None, :, :]) ** 2).sum(axis=2)
            out[:, i] = d2.argmin(axis=1)
        return pd.Series(list(out))

    return df.select(
        F.col(id_col),
        *[F.col(c) for c in (keep_cols or [])],
        codes(as_double(F.col(vec_col))).alias("pq_codes"),
    )


def _pq_adc_shortlist(
    encoded: DataFrame,
    codebooks: np.ndarray,
    query_vec: list[float],
    shortlist: int,
    id_col: str,
) -> DataFrame:
    """ADC scoring core shared by :func:`pq_topk` and
    :func:`pq_query_index`: fold the per-subspace query→centroid
    distance tables into the plan as array literals and score each
    code row with m element_at lookups + adds — pure codegen, no
    Python, no shuffle, TakeOrdered(shortlist)."""
    m, kk, sub = codebooks.shape
    q = np.asarray(query_vec, dtype=np.float64)
    q /= max(np.linalg.norm(q), 1e-12)
    score = None
    for i in range(m):
        lut = ((q[i * sub : (i + 1) * sub][None, :] - codebooks[i]) ** 2).sum(axis=1)
        lut_i = F.array(*[F.lit(float(v)) for v in lut])
        term = F.element_at(lut_i, F.element_at("pq_codes", i + 1) + 1)
        score = term if score is None else score + term
    return (
        encoded.select(id_col, score.alias("adc_dist"))
        .orderBy(F.asc("adc_dist"), F.asc(id_col))
        .limit(shortlist)
    )


def pq_topk(
    df: DataFrame,
    codebooks: np.ndarray,
    query_vec: list[float],
    k: int = 10,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ-ADC ANN top-k with exact re-rank: score every encoded vector
    against the query via an asymmetric-distance lookup table, shortlist
    the best ``shortlist``, then re-rank the shortlist with exact cosine.

    Only the shortlist rows (tiny) are joined back to fetch true
    vectors for the exact re-rank. Distances are on L2-normalized
    vectors, so ADC order ~ cosine order. See :func:`_pq_adc_shortlist`
    for the codegen scoring core.
    """
    encoded = pq_encode(df, codebooks, id_col=id_col, vec_col=vec_col)
    short = _pq_adc_shortlist(encoded, codebooks, query_vec, shortlist, id_col)
    cand = df.join(F.broadcast(short.select(id_col)), id_col)
    return brute_force_topk(cand, query_vec, k=k, id_col=id_col, vec_col=vec_col)


def _pq_adc_shortlist_df(
    encoded: DataFrame,
    codebooks: np.ndarray,
    probe: DataFrame,
    shortlist: int,
    id_col: str,
    where: Column | None = None,
) -> DataFrame:
    """In-plan ADC scoring shared by :func:`pq_topk_df` and
    :func:`pq_query_index_df`: the codebooks (a few KB, driver-trained
    by construction) fold in as array<array<double>> literals; each
    encoded row's distance is m element_at/slice/zip_with terms
    between its chosen centroids and the broadcast (L2-normalized)
    probe vector — pure codegen, no Python, no driver job for the
    query itself. An optional metadata predicate applies BELOW the
    scoring (pre-filter, pushable into the index scan)."""
    m, _kk, sub = codebooks.shape
    pvn = _probe_normalized()
    score = None
    for i in range(m):
        # ONE parsed SQL expression per subspace instead of m·k·sub
        # F.lit() py4j round-trips (4096 of them cost ~5s of pure
        # driver-side plan construction; the parsed string costs ms)
        cents = F.expr(
            "array("
            + ",".join(
                "array(" + ",".join(f"{float(v)!r}D" for v in c) + ")"
                for c in codebooks[i]
            )
            + ")"
        )
        chosen = F.element_at(cents, F.element_at("pq_codes", i + 1) + 1)
        qsub = F.slice(F.col("_pvn"), i * sub + 1, sub)
        term = F.aggregate(
            F.zip_with(qsub, chosen, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        score = term if score is None else score + term
    if where is not None:
        encoded = encoded.where(where)
    return (
        encoded.crossJoin(F.broadcast(probe.select(pvn.alias("_pvn"))))
        .select(id_col, score.alias("adc_dist"))
        .orderBy(F.asc("adc_dist"), F.asc(id_col))
        .limit(shortlist)
    )


def pq_topk_df(
    df: DataFrame,
    codebooks: np.ndarray,
    probe: DataFrame,
    k: int = 10,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """:func:`pq_topk` with the probe as a 1-row DataFrame
    (:func:`probe_row`): ADC lookup in-plan via
    :func:`_pq_adc_shortlist_df`, exact re-rank on the broadcast
    shortlist — single job end to end."""
    encoded = pq_encode(df, codebooks, id_col=id_col, vec_col=vec_col)
    short = _pq_adc_shortlist_df(encoded, codebooks, probe, shortlist, id_col)
    cand = df.join(F.broadcast(short.select(id_col)), id_col)
    return brute_force_topk_df(cand, probe, k=k, id_col=id_col, vec_col=vec_col)


def pq_query_index_df(
    spark: SparkSession,
    source_df: DataFrame,
    index_path: str,
    probe: DataFrame,
    k: int = 10,
    shortlist: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    where: Column | None = None,
) -> DataFrame:
    """ANN top-k against a :func:`pq_build_index` layout with the probe
    as a 1-row DataFrame, optionally composed with a metadata predicate
    over columns stored in the index (``pq_build_index(keep_cols=…)``).

    The per-query scan is the COMPRESSED index (id, metadata, codes —
    ~m bytes/vector), with the predicate pushed into that scan as a
    data filter; raw vectors are touched only for the ``shortlist``
    re-rank rows. The codebook read is bounded (m·k rows) by
    construction — the PQ twin of the IVF centroid fetch."""
    cb = spark.read.parquet(f"{index_path}/_codebooks").collect()
    mm = 1 + max(r["subspace"] for r in cb)
    kk = 1 + max(r["code"] for r in cb)
    sub = len(cb[0]["centroid"])
    books = np.empty((mm, kk, sub))
    for r in cb:
        books[r["subspace"], r["code"]] = r["centroid"]
    encoded = spark.read.parquet(index_path)
    short = _pq_adc_shortlist_df(
        encoded, books, probe, shortlist, id_col, where=where
    )
    cand = source_df.join(F.broadcast(short.select(id_col)), id_col)
    return brute_force_topk_df(cand, probe, k=k, id_col=id_col, vec_col=vec_col)


def _write_strata(
    df: DataFrame,
    index_path: str,
    keep_cols: list[str] | None,
    mode: str = "overwrite",
) -> None:
    """Persist per-``keep_cols``-combination row counts under
    ``{index_path}/_strata`` (underscore-invisible to the data scan,
    like ``_codebooks``). One bounded aggregate at build/append time
    buys every FILTERED query its stratum cardinality from metadata —
    no corpus-scan ``.count()`` during plan construction (VERDICT r11
    item 7). Appends add rows; readers SUM, so batch strata never need
    read-modify-write."""
    if not keep_cols:
        return
    (
        df.groupBy(*keep_cols)
        .agg(F.count("*").alias("n"))
        .coalesce(1)
        .write.mode(mode)
        .parquet(f"{index_path}/_strata")
    )


def _check_strata_keep_cols(
    index_path: str, keep_cols: list[str] | None
) -> None:
    """Fail an index APPEND whose ``keep_cols`` disagrees with the
    build's persisted ``_strata`` layout (ADVICE r12: omitting
    keep_cols on an append to a strata-backed index silently skipped
    the ``_strata`` append, so index_stratum_count undercounted forever
    after and filtered queries sized shortlists from stale counts)."""
    import os

    import pyarrow.dataset as ds

    strata_dir = f"{index_path}/_strata"
    built_with = None
    if os.path.exists(strata_dir):
        built_with = sorted(
            n
            for n in ds.dataset(strata_dir, format="parquet").schema.names
            if n != "n"
        )
    appending_with = sorted(keep_cols) if keep_cols else None
    if built_with != appending_with:
        raise ValueError(
            f"index at {index_path!r} was built with strata over "
            f"{built_with} but the append passes keep_cols="
            f"{appending_with}; pass the build's keep_cols so the "
            "_strata counts stay true (index_stratum_count reads them)"
        )


def index_stratum_count(index_path: str, where: dict) -> int:
    """Rows in the index matching the ``{keep_col: value}`` equality
    predicate, from the persisted ``_strata`` relation — a driver-side
    pyarrow read of an O(|strata|) file, zero Spark jobs (the filtered
    twin of tables.table_num_rows). Raises FileNotFoundError when the
    index was built without ``keep_cols``."""
    import pyarrow.compute as pc
    import pyarrow.dataset as ds

    data = ds.dataset(f"{index_path}/_strata", format="parquet")
    expr = None
    for c, v in where.items():
        e = pc.field(c) == v
        expr = e if expr is None else expr & e
    tbl = data.to_table(filter=expr, columns=["n"])
    return int(sum(tbl.column("n").to_pylist()))


def pq_build_index(
    df: DataFrame,
    index_path: str,
    m: int = 8,
    k: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_mod: int | None = None,
    keep_cols: list[str] | None = None,
) -> None:
    """Materialize the PQ index: codebooks + per-vector codes on disk.

    The build is one training sample + one encode map pass; the stored
    index is (id, codes) — ~m bytes of payload per vector vs 8·dim for
    raw doubles (64 dims, m=8: a 64x scan-width reduction). Codebooks
    (m·k·dim/m doubles — KB) live under ``_codebooks``, invisible to
    the data scan like IVF's ``_centroids``. ``keep_cols`` stores
    metadata columns alongside the codes so filtered queries
    (:func:`pq_query_index_df` ``where=``) pre-filter INSIDE the
    compressed scan.
    """
    books = pq_train_codebooks(
        df, m=m, k=k, id_col=id_col, vec_col=vec_col, sample_mod=sample_mod
    )
    pq_encode(
        df, books, id_col=id_col, vec_col=vec_col, keep_cols=keep_cols
    ).write.mode("overwrite").parquet(index_path)
    spark = df.sparkSession
    mm, kk, sub = books.shape
    rows = [
        (i, j, [float(x) for x in books[i, j]])
        for i in range(mm)
        for j in range(kk)
    ]
    spark.createDataFrame(
        rows, "subspace int, code int, centroid array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{index_path}/_codebooks")
    _write_strata(df, index_path, keep_cols)


def pq_query_index(
    spark: SparkSession,
    source_df: DataFrame,
    index_path: str,
    query_vec: list[float],
    k: int = 10,
    shortlist: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k against a :func:`pq_build_index` layout.

    The ADC scan reads ONLY (id, codes) from the index — the raw
    vectors are untouched until the exact re-rank fetches the
    ``shortlist`` rows from ``source_df``. At 100 TB that is the whole
    point of PQ: the per-query scan is the compressed index, not the
    corpus.
    """
    cb = spark.read.parquet(f"{index_path}/_codebooks").collect()
    mm = 1 + max(r["subspace"] for r in cb)
    kk = 1 + max(r["code"] for r in cb)
    sub = len(cb[0]["centroid"])
    books = np.empty((mm, kk, sub))
    for r in cb:
        books[r["subspace"], r["code"]] = r["centroid"]
    encoded = spark.read.parquet(index_path)
    short = _pq_adc_shortlist(encoded, books, query_vec, shortlist, id_col)
    cand = source_df.join(F.broadcast(short.select(id_col)), id_col)
    return brute_force_topk(cand, query_vec, k=k, id_col=id_col, vec_col=vec_col)


def semantic_dedup_pairs(
    df: DataFrame,
    threshold: float = 0.45,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """SemDeDup-style cluster-scoped semantic near-duplicate pairs
    (Abbas et al. 2023, public method): a KMeans coarse clustering
    bounds the pairwise-cosine search to WITHIN-CELL blocks, the third
    blocking strategy next to SRP-LSH (:func:`cosine_near_duplicates`)
    and MinHash (operators/dedup.py).

    Scale shape: pair work is Σ_cell O(|cell|²) instead of O(n²) —
    size n_cells so cells stay bounded (the published method uses
    ~√n to 0.1·n clusters on 100M+ docs); the self-join shuffles on
    the cell id with both sides the SAME exchange (reused). Cross-cell
    near-dups are missed BY DESIGN — that is the method's documented
    approximation, traded for never materializing cross-cell pairs;
    the registered query pins measured recall against the exact
    all-pairs twin.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = df.withColumn("_feat", array_to_vector(as_double(F.col(vec_col))))
    km = KMeans(
        k=n_cells, seed=seed, maxIter=5, featuresCol="_feat", predictionCol="_cell"
    )
    model = km.fit(feats.select("_feat"))
    assigned = model.transform(feats).select(
        F.col(id_col).alias("_id"),
        F.col("_cell"),
        as_double(F.col(vec_col)).alias("_v"),
    )
    a, b = assigned.alias("a"), assigned.alias("b")
    cos = cosine(F.col("a._v"), F.col("b._v"))
    return (
        a.hint("shuffle_hash")
        .join(
            b.hint("shuffle_hash"),
            (F.col("a._cell") == F.col("b._cell"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .where(cos >= threshold)
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.round(cos, 4).alias("cosine_sim"),
        )
    )


def ivf_index_balance(spark: SparkSession, index_path: str) -> DataFrame:
    """Per-cell occupancy of an IVF index plus the imbalance ratio —
    the measurement behind the re-fit decision, exactly as
    operators/skew.py justifies salting: :func:`ivf_index_append`
    assigns to FROZEN centroids, so drift concentrates new vectors in
    few cells; when max_cell/mean_cell grows past ~3-4x, probe
    pruning degrades (hot cells scan like brute force) and a periodic
    :func:`ivf_build_index` re-fit is due. One partition-pruned
    aggregate over the index — O(cells) output."""
    counts = (
        spark.read.parquet(index_path)
        .groupBy("cell")
        .agg(F.count("*").alias("n_vectors"))
    )
    stats = counts.agg(
        F.max("n_vectors").alias("_mx"), F.avg("n_vectors").alias("_avg")
    )
    return (
        counts.crossJoin(F.broadcast(stats))
        .select(
            "cell",
            "n_vectors",
            (F.col("_mx") / F.col("_avg")).alias("imbalance_ratio"),
        )
        .orderBy("cell")
    )


def ivf_maintain(
    spark: SparkSession,
    index_path: str,
    max_imbalance: float = 4.0,
    n_cells: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> dict:
    """Close the re-fit loop :func:`ivf_index_balance` only measures
    (VERDICT r6 item 8): when the max/mean cell-occupancy ratio crosses
    ``max_imbalance``, re-fit the coarse quantizer over the index's
    CURRENT contents and republish the partitioned layout; otherwise
    do nothing. Returns ``{"rebuilt", "imbalance_ratio", "n_cells",
    "n_vectors"}`` so schedulers can log the decision.

    The maintenance story as an operator: run it after (or every N)
    :func:`ivf_index_append` ingests — appends assign to frozen
    centroids, drift concentrates new vectors in few cells, and past
    the bound probe pruning degrades toward brute force. The ratio
    check is one partition-pruned aggregate (O(cells) driver read);
    the rebuild is the same one-pass + one-shuffle-on-cell build as
    :func:`ivf_build_index`, staged to a sibling dir and rename-swapped
    in (the compact_files discipline — writing over a path Spark is
    reading from is not allowed, and the stage+swap leaves a complete
    index under a well-known name at every instant; on an object store
    publish via operators/manifest.py instead).

    ``n_cells`` defaults to the current centroid count — maintenance
    preserves the index's resolution unless told otherwise.
    """
    import shutil

    recovered = _recover_rebuild(spark, index_path)
    stats = (
        spark.read.parquet(index_path)
        .groupBy("cell")
        .agg(F.count("*").alias("n"))
        .agg(
            F.max("n").alias("mx"),
            F.avg("n").alias("avg"),
            F.sum("n").alias("total"),
        )
        .first()
    )
    ratio = float(stats["mx"]) / float(stats["avg"])
    cur_cells = spark.read.parquet(f"{index_path}/_centroids").count()
    report = {
        "rebuilt": False,
        "recovered": recovered,
        "imbalance_ratio": round(ratio, 3),
        "n_cells": n_cells or cur_cells,
        "n_vectors": int(stats["total"]),
    }
    if ratio <= max_imbalance:
        return report
    vectors = spark.read.parquet(index_path).drop("cell")
    staging = index_path.rstrip("/") + "._rebuilding"
    retired = index_path.rstrip("/") + "._preindex"
    shutil.rmtree(staging, ignore_errors=True)
    ivf_build_index(
        vectors,
        staging,
        n_cells=n_cells or cur_cells,
        id_col=id_col,
        vec_col=vec_col,
        seed=seed,
    )
    _publish_rebuild(spark, index_path, staging, retired)
    report["rebuilt"] = True
    return report


def _recover_rebuild(
    spark: SparkSession,
    index_path: str,
    required_subdirs: tuple[str, ...] = ("_centroids",),
) -> str | None:
    """Heal an interrupted :func:`_publish_rebuild` (ADVICE r7): a
    crash between the two renames leaves the index ONLY under
    ``._rebuilding`` / ``._preindex``, and the next maintain/query call
    would fail on a missing path. Same discipline as
    ``operators/layout.py recover_compaction``: promote the staged
    rebuild if it is complete (root ``_SUCCESS`` plus every required
    sidecar dir's ``_SUCCESS`` — data is written before sidecars, so a
    partial build cannot pass), else restore the retired index; with a
    live index, leftovers are just cleaned. Returns the action taken
    (``"promoted_rebuilding"`` / ``"restored_preindex"``) or None.
    Runs at the top of :func:`ivf_maintain` / :func:`ivfpq_maintain`,
    so the periodic maintenance call is also the repair hook."""
    import os
    import shutil

    staging = index_path.rstrip("/") + "._rebuilding"
    retired = index_path.rstrip("/") + "._preindex"
    if os.path.isdir(index_path):
        shutil.rmtree(staging, ignore_errors=True)
        shutil.rmtree(retired, ignore_errors=True)
        return None

    def complete(path: str) -> bool:
        marks = [os.path.join(path, "_SUCCESS")] + [
            os.path.join(path, d, "_SUCCESS") for d in required_subdirs
        ]
        return all(os.path.exists(m) for m in marks)

    if os.path.isdir(staging) and complete(staging):
        os.rename(staging, index_path)
        shutil.rmtree(retired, ignore_errors=True)
        spark.catalog.refreshByPath(index_path)
        spark.catalog.refreshByPath(staging)
        return "promoted_rebuilding"
    if os.path.isdir(retired):
        shutil.rmtree(staging, ignore_errors=True)
        os.rename(retired, index_path)
        spark.catalog.refreshByPath(index_path)
        return "restored_preindex"
    return None


def _publish_rebuild(
    spark: SparkSession, index_path: str, staging: str, retired: str
) -> None:
    """Swap a staged index rebuild into place (shared by
    :func:`ivf_maintain` / :func:`ivfpq_maintain`): retire the live
    dir, rename the staging dir in, drop both paths' cached file
    listings — the session read the OLD index this call and may have
    listed the staging dir; a stale InMemoryFileIndex would hand
    readers deleted files. POSIX-rename strategy; on an object store
    publish via operators/manifest.py instead."""
    import os
    import shutil

    shutil.rmtree(retired, ignore_errors=True)
    os.rename(index_path, retired)
    os.rename(staging, index_path)
    shutil.rmtree(retired)
    spark.catalog.refreshByPath(index_path)
    spark.catalog.refreshByPath(staging)


# ---------------------------------------------------------------------------
# IVF-PQ composite index: coarse cells (planning-time partition pruning)
# + residual product quantization (compressed in-cell scan). The
# standard billion-scale ANN layout (Jégou et al., "Product
# Quantization for Nearest Neighbor Search", TPAMI 2011; the FAISS
# IVFPQ default): IVF bounds WHICH files a query opens, PQ bounds how
# WIDE the rows it reads are. At 100 TB the per-query scan is
# n_probe/n_cells of the partitions × ~m bytes/vector — both axes of
# the corpus scan cost collapse at once, which neither index achieves
# alone (IVF still reads raw vectors inside probed cells; flat PQ
# still reads every row's codes).
# ---------------------------------------------------------------------------


def _centroids_to_expr(centroids: list[list[float]]) -> Column:
    """The (n_cells × dim, bounded by construction) coarse-centroid
    table as ONE parsed array<array<double>> literal — same
    plan-construction trick as the PQ codebook literals (a parsed SQL
    string costs ms where n_cells·dim F.lit py4j round-trips cost
    seconds)."""
    return F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(f"{float(v)!r}D" for v in c) + ")"
            for c in centroids
        )
        + ")"
    )


def _normalized(vec_col: str) -> Column:
    v = as_double(F.col(vec_col))
    return F.transform(v, lambda x: x / F.greatest(l2_norm(v), F.lit(1e-12)))


def _probe_normalized() -> Column:
    """The probe_row ``_pv`` column L2-normalized — the space PQ/IVF-PQ
    centroids are fit in. The ONE definition of probe normalization:
    cell ranking (ivfpq_query/topk) and ADC scoring (both shortlist
    helpers) all call this, so the epsilon/norm expression can never
    diverge between the two stages again (the r7 ADVICE bug class).
    ``_pv`` is already array<double> by construction (every probe
    selection goes through ``as_double``), hence no cast here —
    :func:`_normalized` is the general-column variant that casts."""
    return F.transform(
        F.col("_pv"),
        lambda x: x / F.greatest(l2_norm(F.col("_pv")), F.lit(1e-12)),
    )


def ivfpq_build_index(
    df: DataFrame,
    index_path: str,
    n_cells: int = 16,
    m: int = 8,
    k: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    sample_mod: int | None = None,
    keep_cols: list[str] | None = None,
) -> None:
    """Materialize the IVF-PQ layout: fit the coarse quantizer on the
    L2-NORMALIZED corpus, PQ-encode each vector's RESIDUAL against its
    cell centroid, and write ``(id, keep_cols, pq_codes)``
    ``partitionBy(cell)``.

    Residual encoding is what makes the composite better than
    PQ-inside-cells: after subtracting the centroid the remaining
    variance is a fraction of the corpus variance, so the same (m, k)
    codebook budget spends its centroids on a much tighter
    distribution — the quantization error drops with no extra bytes.
    One shared codebook set is trained across cells on residual
    samples (the FAISS default, vs per-cell books at n_cells× the
    codebook memory).

    Build cost: one KMeans fit (sampled iterative), one bounded
    residual-sample collect for codebook training, one encode map
    pass + one shuffle on cell. Artifacts: ``_centroids`` (n_cells ×
    dim) and ``_codebooks`` (m · k × dim/m) — both KB-scale,
    underscore-invisible to the partitioned data scan.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    spark = df.sparkSession
    feats = df.withColumn("_xn", _normalized(vec_col)).withColumn(
        "_feat", array_to_vector(F.col("_xn"))
    )
    km = KMeans(
        k=n_cells, seed=seed, maxIter=5, featuresCol="_feat", predictionCol="cell"
    )
    model = km.fit(feats.select("_feat"))
    cents = [[float(x) for x in c] for c in model.clusterCenters()]
    chosen = F.element_at(_centroids_to_expr(cents), F.col("cell") + 1)
    resid = feats.transform(model.transform).select(
        F.col(id_col),
        *[F.col(c) for c in (keep_cols or [])],
        F.col("cell"),
        F.zip_with(F.col("_xn"), chosen, lambda a, b: a - b).alias("_resid"),
    )
    books = pq_train_codebooks(
        resid,
        m=m,
        k=k,
        id_col=id_col,
        vec_col="_resid",
        sample_mod=sample_mod,
        normalize=False,
    )
    pq_encode(
        resid,
        books,
        id_col=id_col,
        vec_col="_resid",
        keep_cols=[*(keep_cols or []), "cell"],
        normalize=False,
    ).write.mode("overwrite").partitionBy("cell").parquet(index_path)
    spark.createDataFrame(
        [(i, c) for i, c in enumerate(cents)],
        "cell int, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{index_path}/_centroids")
    mm, kk, sub = books.shape
    spark.createDataFrame(
        [
            (i, j, [float(x) for x in books[i, j]])
            for i in range(mm)
            for j in range(kk)
        ],
        "subspace int, code int, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{index_path}/_codebooks")
    _write_strata(df, index_path, keep_cols)


def _read_codebooks(spark: SparkSession, index_path: str) -> np.ndarray:
    """The persisted PQ codebooks back as (m, k, dim/m) — a bounded
    m·k-row read by construction (shared with the flat-PQ index)."""
    cb = spark.read.parquet(f"{index_path}/_codebooks").collect()
    mm = 1 + max(r["subspace"] for r in cb)
    kk = 1 + max(r["code"] for r in cb)
    books = np.empty((mm, kk, len(cb[0]["centroid"])))
    for r in cb:
        books[r["subspace"], r["code"]] = r["centroid"]
    return books


def ivfpq_index_append(
    spark: SparkSession,
    index_path: str,
    batch: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: list[str] | None = None,
) -> None:
    """O(batch) incremental ingest into an :func:`ivfpq_build_index`
    layout: assign each new vector to the nearest FROZEN centroid
    (argmin over the bounded centroid literal, pure Column algebra —
    same shape as :func:`ivf_index_append`), PQ-encode its residual
    with the FROZEN codebooks, append into the batch's cells only.
    Centroid/codebook drift accumulates until :func:`ivf_maintain`'s
    policy (which generalizes: measure occupancy, re-fit past the
    bound) triggers a rebuild.

    ``keep_cols`` must match the build's: an append that omits it
    against an index built with strata would silently skip the
    ``_strata`` append, and every later filtered query would size its
    shortlist from stale counts (ADVICE r12) — checked here, loudly."""
    _check_strata_keep_cols(index_path, keep_cols)
    cents = [
        [float(x) for x in r["centroid"]]
        for r in sorted(
            spark.read.parquet(f"{index_path}/_centroids").collect(),
            key=lambda r: r["cell"],
        )
    ]
    books = _read_codebooks(spark, index_path)
    cent_lit = _centroids_to_expr(cents)
    xn = _normalized(vec_col)
    d2s = F.transform(
        cent_lit,
        lambda c: F.aggregate(
            F.zip_with(F.col("_xn"), c, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    assigned = (
        batch.withColumn("_xn", xn)
        .withColumn("_d2", d2s)
        .withColumn(
            "cell",
            (F.array_position(F.col("_d2"), F.array_min("_d2")) - 1).cast("int"),
        )
    )
    chosen = F.element_at(cent_lit, F.col("cell") + 1)
    resid = assigned.select(
        F.col(id_col),
        *[F.col(c) for c in (keep_cols or [])],
        F.col("cell"),
        F.zip_with(F.col("_xn"), chosen, lambda a, b: a - b).alias("_resid"),
    )
    pq_encode(
        resid,
        books,
        id_col=id_col,
        vec_col="_resid",
        keep_cols=[*(keep_cols or []), "cell"],
        normalize=False,
    ).write.mode("append").partitionBy("cell").parquet(index_path)
    _write_strata(batch, index_path, keep_cols, mode="append")


def _ivfpq_adc_shortlist_df(
    encoded: DataFrame,
    centroids: list[list[float]],
    books: np.ndarray,
    probe: DataFrame,
    shortlist: int,
    id_col: str,
    where: Column | None = None,
) -> DataFrame:
    """In-plan residual-ADC scoring: distance ≈ Σᵢ ‖(q̂ − cent_cell)ᵢ −
    codebookᵢ[codeᵢ]‖² — the query residual against each row's cell
    folds in as ``element_at`` on the centroid literal, so ONE pruned
    scan scores every probed cell (no per-cell plan union). Pure
    codegen, no Python, no driver job; an optional metadata predicate
    applies BELOW the scoring (pre-filter in the compressed scan)."""
    m, _kk, sub = books.shape
    pvn = _probe_normalized()
    if where is not None:
        encoded = encoded.where(where)
    chosen_cent = F.element_at(_centroids_to_expr(centroids), F.col("cell") + 1)
    scored = (
        encoded.crossJoin(F.broadcast(probe.select(pvn.alias("_pvn"))))
        .withColumn(
            "_qr", F.zip_with(F.col("_pvn"), chosen_cent, lambda a, b: a - b)
        )
    )
    score = None
    for i in range(m):
        cents_i = F.expr(
            "array("
            + ",".join(
                "array(" + ",".join(f"{float(v)!r}D" for v in c) + ")"
                for c in books[i]
            )
            + ")"
        )
        code_cent = F.element_at(cents_i, F.element_at("pq_codes", i + 1) + 1)
        qsub = F.slice(F.col("_qr"), i * sub + 1, sub)
        term = F.aggregate(
            F.zip_with(qsub, code_cent, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        score = term if score is None else score + term
    return (
        scored.select(id_col, score.alias("adc_dist"))
        .orderBy(F.asc("adc_dist"), F.asc(id_col))
        .limit(shortlist)
    )


def ivfpq_query_index_df(
    spark: SparkSession,
    source_df: DataFrame,
    index_path: str,
    probe: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    shortlist: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    where: Column | None = None,
) -> DataFrame:
    """ANN top-k against an :func:`ivfpq_build_index` layout with the
    probe as a 1-row DataFrame (:func:`probe_row`).

    Query path: (1) rank the bounded centroid table against the probe
    and collect the ``n_probe`` winning cell ids — the same
    fixed-size driver step as :func:`ivf_query_index_df`, the price of
    a PLANNING-time ``cell IN (...)`` partition predicate; (2) ONE
    pruned compressed scan ADC-scores the probed cells' codes
    (~m bytes/vector read, raw vectors untouched); (3) the
    ``shortlist`` winners re-rank with exact cosine against
    ``source_df`` — only those rows ever touch raw vectors. A
    metadata predicate (``keep_cols`` at build) pre-filters inside
    the pruned compressed scan."""
    cents_rows = sorted(
        spark.read.parquet(f"{index_path}/_centroids").collect(),
        key=lambda r: r["cell"],
    )
    cents = [[float(x) for x in r["centroid"]] for r in cents_rows]
    cdf = spark.createDataFrame(
        [(r["cell"], [float(x) for x in r["centroid"]]) for r in cents_rows],
        "cell int, centroid array<double>",
    )
    # Rank cells against the NORMALIZED probe (ADVICE r7): the coarse
    # centroids were fit on L2-normalized vectors and the ADC stage
    # normalizes the probe, so an un-normalized probe here could pick
    # different n_probe cells than the space the index lives in —
    # silently degrading recall in a way the exact re-rank cannot
    # repair (it only sees the probed cells' shortlist).
    d2 = F.aggregate(
        F.zip_with(
            F.col("centroid"), _probe_normalized(), lambda a, b: (a - b) * (a - b)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cells = [
        r["cell"]
        for r in cdf.crossJoin(F.broadcast(probe))
        .select("cell", d2.alias("_d2"))
        .orderBy(F.asc("_d2"), F.asc("cell"))
        .limit(n_probe)
        .collect()
    ]
    books = _read_codebooks(spark, index_path)
    scan = spark.read.parquet(index_path).where(F.col("cell").isin(cells))
    short = _ivfpq_adc_shortlist_df(
        scan, cents, books, probe, shortlist, id_col, where=where
    )
    cand = source_df.join(F.broadcast(short.select(id_col)), id_col)
    return brute_force_topk_df(cand, probe, k=k, id_col=id_col, vec_col=vec_col)


def ivfpq_topk_df(
    df: DataFrame,
    probe: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    m: int = 8,
    n_codes: int = 64,
    n_probe: int = 4,
    shortlist: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    sample_mod: int | None = None,
) -> DataFrame:
    """:func:`ivfpq_query_index_df` semantics with everything computed
    on the fly (no persisted layout): fit the coarse quantizer, train
    residual codebooks, encode, semi-join the in-plan top-``n_probe``
    cells, residual-ADC shortlist, exact re-rank. The fit and the
    codebook-sample collect are the only eager steps; probe-cell
    selection stays IN-plan (centroid literal relation vs the
    broadcast probe — same shape as :func:`ivf_topk_df`). The demo /
    correctness twin of the persisted index — at scale use the
    build/append/query surface, which swaps the on-the-fly cell
    semi-join for planning-time partition pruning."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    spark = df.sparkSession
    feats = df.withColumn("_xn", _normalized(vec_col)).withColumn(
        "_feat", array_to_vector(F.col("_xn"))
    )
    km = KMeans(
        k=n_cells, seed=seed, maxIter=5, featuresCol="_feat", predictionCol="cell"
    )
    model = km.fit(feats.select("_feat"))
    cents = [[float(x) for x in c] for c in model.clusterCenters()]
    chosen = F.element_at(_centroids_to_expr(cents), F.col("cell") + 1)
    resid = feats.transform(model.transform).select(
        F.col(id_col),
        F.col("cell"),
        F.zip_with(F.col("_xn"), chosen, lambda a, b: a - b).alias("_resid"),
    )
    books = pq_train_codebooks(
        resid,
        m=m,
        k=n_codes,
        id_col=id_col,
        vec_col="_resid",
        sample_mod=sample_mod,
        normalize=False,
    )
    encoded = pq_encode(
        resid,
        books,
        id_col=id_col,
        vec_col="_resid",
        keep_cols=["cell"],
        normalize=False,
    )
    cdf = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cents)], "pcell int, centroid array<double>"
    )
    # normalized-probe cell ranking — same ADVICE r7 fix as
    # ivfpq_query_index_df (centroids live in the normalized space)
    d2 = F.aggregate(
        F.zip_with(
            F.col("centroid"), _probe_normalized(), lambda a, b: (a - b) * (a - b)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    top_cells = (
        cdf.crossJoin(F.broadcast(probe))
        .select("pcell", d2.alias("_d2"))
        .orderBy(F.asc("_d2"), F.asc("pcell"))
        .limit(n_probe)
        .select("pcell")
    )
    pruned = encoded.join(
        F.broadcast(top_cells), F.col("cell") == F.col("pcell"), "left_semi"
    )
    short = _ivfpq_adc_shortlist_df(pruned, cents, books, probe, shortlist, id_col)
    cand = df.join(F.broadcast(short.select(id_col)), id_col)
    return brute_force_topk_df(cand, probe, k=k, id_col=id_col, vec_col=vec_col)


def ivfpq_maintain(
    spark: SparkSession,
    index_path: str,
    source_df: DataFrame,
    max_imbalance: float = 4.0,
    n_cells: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    sample_mod: int | None = None,
    keep_cols: list[str] | None = None,
) -> dict:
    """:func:`ivf_maintain`'s policy for the COMPOSITE layout: measure
    the cell-occupancy ratio with one aggregate, re-fit past the bound,
    no-op under it. Same report dict, same stage+rename publish.

    The one structural difference: the IVF-PQ index stores CODES, not
    raw vectors, so a rebuild cannot self-feed — ``source_df`` (the
    corpus the index serves, i.e. what build + every append ingested)
    supplies the vectors. m and k are preserved from the persisted
    codebooks; ``n_cells`` defaults to the current centroid count.
    Re-fitting also re-trains the residual codebooks against the NEW
    centroids — after heavy drift the old books quantize residuals
    against centroids that no longer describe the data, so the refit
    restores both pruning selectivity AND quantization fidelity in one
    pass.
    """
    import shutil

    recovered = _recover_rebuild(
        spark, index_path, required_subdirs=("_centroids", "_codebooks")
    )
    stats = (
        spark.read.parquet(index_path)
        .groupBy("cell")
        .agg(F.count("*").alias("n"))
        .agg(
            F.max("n").alias("mx"),
            F.avg("n").alias("avg"),
            F.sum("n").alias("total"),
        )
        .first()
    )
    ratio = float(stats["mx"]) / float(stats["avg"])
    cur_cells = spark.read.parquet(f"{index_path}/_centroids").count()
    books = _read_codebooks(spark, index_path)
    m, k, _sub = books.shape
    report = {
        "rebuilt": False,
        "recovered": recovered,
        "imbalance_ratio": round(ratio, 3),
        "n_cells": n_cells or cur_cells,
        "n_vectors": int(stats["total"]),
    }
    if ratio <= max_imbalance:
        return report
    staging = index_path.rstrip("/") + "._rebuilding"
    retired = index_path.rstrip("/") + "._preindex"
    shutil.rmtree(staging, ignore_errors=True)
    ivfpq_build_index(
        source_df,
        staging,
        n_cells=n_cells or cur_cells,
        m=int(m),
        k=int(k),
        id_col=id_col,
        vec_col=vec_col,
        seed=seed,
        sample_mod=sample_mod,
        keep_cols=keep_cols,
    )
    _publish_rebuild(spark, index_path, staging, retired)
    report["rebuilt"] = True
    return report
