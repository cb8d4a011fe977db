"""Probabilistic record linkage: Fellegi–Sunter match scoring over
blocked candidate pairs.

The dedup family's candidate generators (equality blocks,
sorted-neighborhood, LSH) answer "which pairs are worth comparing";
this module answers "how much evidence does each comparison carry".
Fellegi–Sunter (JASA 1969) scores a pair by summed per-field log
likelihood ratios: agreement on field c contributes ln(m_c/u_c),
disagreement ln((1−m_c)/(1−u_c)), where m_c = P(agree | same entity)
and u_c = P(agree | different entities). High-cardinality fields
(u→0) thus carry large agreement weight and mild disagreement
penalty; low-cardinality fields the reverse — exactly the intuition
"matching on a rare value means more".

u-probabilities are ESTIMATED FROM THE DATA, not guessed: for field c
with value frequencies f_v over N rows, the probability two random
distinct rows agree is Σ_v f_v·(f_v−1) / (N·(N−1)) — an exact
bigint ratio both engines reproduce digit for digit. m-probabilities
are caller-supplied literals (the classic practice absent labeled
pairs; EM refinement would estimate them, out of scope).

Scale shape (100 TB): one groupBy per field for the frequency sums
(map-side partials, each reduced to ONE row), 1-row broadcasts of the
u values into the pair scorer, and one equi-join on the block key
with the same hot-block cap discipline as part_name_fuzzy_pairs —
candidate volume is Σ|block|², bounded by the cap, never N². Scoring
is per-row Column algebra in codegen; nothing is collected. (There is
deliberately no single-pass multi-field u aggregation: Spark cannot
nest a window inside an aggregate, and k per-field 1-row aggregates
crossJoined broadcast-side is the cheap part of this plan.)

Reference analog: none — beyond-reference entity resolution
(SURVEY.md §2 extensions).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def u_probability(df: DataFrame, col: str) -> DataFrame:
    """1-row ``(u)`` for one field: Σ f(f−1) / (N(N−1)) — the
    probability two random DISTINCT rows agree on ``col``. NULL counts
    as a regular value (two NULLs agree — mirror any oracle
    accordingly); pass a pre-cleaned column if not wanted."""
    freq = df.groupBy(col).agg(F.count("*").alias("_f"))
    return freq.agg(
        (
            F.sum(F.col("_f") * (F.col("_f") - 1))
            / (F.sum("_f") * (F.sum("_f") - 1))
        ).alias("u")
    )


def fs_score_pairs(
    df: DataFrame,
    id_col: str,
    block_col: Column,
    fields: dict[str, float],
    max_block: int | None = None,
) -> DataFrame:
    """Blocked Fellegi–Sunter scoring: ``(id_a, id_b,
    agree_<field>..., score)`` for every within-block pair
    (``id_a < id_b``).

    ``fields`` maps column name → m-probability literal in (0, 1);
    u-probabilities come from :func:`u_probability` per field and fold
    into the scorer as 1-row broadcasts — the weights are computed
    IN-PLAN (no collect), so the whole thing is one lazy DataFrame.
    ``max_block`` drops blocks larger than the bound on BOTH join
    sides (the part_name_fuzzy_pairs hot-block discipline) — without
    it one degenerate block is quadratic. Agreement is null-safe
    equality; the score is a per-row sum of k log terms (no
    aggregation, so no summation-order concern).
    """
    for c, m in fields.items():
        if not (0.0 < m < 1.0):
            raise ValueError(f"m for {c!r} must be in (0,1), got {m}")
    keyed = df.withColumn("_blk", block_col).where(F.col("_blk").isNotNull())
    if max_block is not None:
        from pyspark.sql import Window as W

        keyed = keyed.withColumn(
            "_bsz", F.count("*").over(W.partitionBy("_blk"))
        ).where(F.col("_bsz") <= max_block)
    cols = [id_col, "_blk", *fields]
    a = keyed.select([F.col(c).alias(f"a_{c}") for c in cols])
    b = keyed.select([F.col(c).alias(f"b_{c}") for c in cols])
    pairs = a.join(
        b,
        (F.col("a__blk") == F.col("b__blk"))
        & (F.col(f"a_{id_col}") < F.col(f"b_{id_col}")),
    )
    score: Column = F.lit(0.0)
    out_cols = [
        F.col(f"a_{id_col}").alias("id_a"),
        F.col(f"b_{id_col}").alias("id_b"),
    ]
    # Degenerate-field guard: an all-distinct field estimates u=0
    # (ln(m/0) -> NULL under non-ANSI division), a constant field u=1
    # (ln((1-m)/0) in the disagreement weight), and N<=1 rows u=NULL —
    # any of which would silently NULL the ENTIRE score column for
    # every pair. Clamp u into (eps, 1-eps): the clamped weight is the
    # natural "rarest observable frequency" saturation of the log
    # likelihood ratio, and a NULL u (unscorable field) degrades to the
    # uninformative u=eps bound instead of poisoning the sum.
    _EPS = 1e-9
    for c, m in fields.items():
        u1 = u_probability(df, c).select(
            F.least(
                F.greatest(F.coalesce(F.col("u"), F.lit(_EPS)), F.lit(_EPS)),
                F.lit(1.0 - _EPS),
            ).alias(f"_u_{c}")
        )
        pairs = pairs.join(F.broadcast(u1))
        agree = F.col(f"a_{c}").eqNullSafe(F.col(f"b_{c}"))
        w_agree = F.log(F.lit(m) / F.col(f"_u_{c}"))
        w_dis = F.log(F.lit(1.0 - m) / (F.lit(1.0) - F.col(f"_u_{c}")))
        score = score + F.when(agree, w_agree).otherwise(w_dis)
        out_cols.append(agree.alias(f"agree_{c}"))
    out_cols.append(score.alias("score"))
    return pairs.select(*out_cols)


def golden_records(
    members: DataFrame,
    cluster_col: str,
    fields: Sequence[str],
) -> DataFrame:
    """Survivorship: collapse each entity cluster to one golden row —
    ``(cluster_col, n_members, golden_<f>, n_distinct_<f> ...)``.

    ``members`` is the (cluster, attributes...) relation produced by
    joining a cluster mapping (operators/graph.duplicate_clusters)
    back onto the source records. Per field the golden value is the
    MODE with a deterministic tie-break (max count, then MIN value) —
    never ``first()`` — so the same cluster always collapses to the
    same row at any partition order. ``n_distinct_<f>`` is the
    conflict signal: 1 means the cluster agrees, >1 means the field
    genuinely disagreed and a human rule (recency, source trust) may
    belong upstream.

    Scale shape (100 TB): per field one (cluster, value) hash
    aggregation with map-side partials, one bounded per-cluster max,
    and equi-joins on the cluster key — no window, no per-cluster
    arrays (a million-member boilerplate cluster stays distributed;
    collect_list survivorship would OOM on it).
    """
    base = members.groupBy(cluster_col).agg(
        F.count("*").cast("bigint").alias("n_members")
    )
    out = base
    for f in fields:
        counts = members.groupBy(cluster_col, f).agg(
            F.count("*").alias("_cnt")
        )
        mx = counts.groupBy(cluster_col).agg(
            F.max("_cnt").alias("_mx"),
            F.count("*").cast("bigint").alias("_nd"),
        )
        mode = (
            counts.join(mx, cluster_col)
            .where(F.col("_cnt") == F.col("_mx"))
            .groupBy(cluster_col)
            .agg(
                F.min(f).alias(f"golden_{f}"),
                F.max("_nd").alias(f"n_distinct_{f}"),
            )
        )
        out = out.join(mode, cluster_col)
    return out
