"""Fellegi–Sunter linkage pins (operators/er.py): u estimation,
weight signs/magnitudes, hot-block cap, and null-safe agreement."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from etl_mudah_spark.operators.er import fs_score_pairs, u_probability


def test_u_probability_exact(spark):
    # values: x,x,x,y -> agreements among distinct pairs: C(3,2)=3 of
    # C(4,2)=6 -> u = 0.5. (Sum form: 3*2 + 1*0 = 6 over 4*3 = 12.)
    df = spark.createDataFrame([("x",), ("x",), ("x",), ("y",)], "v string")
    assert u_probability(df, "v").first().u == pytest.approx(0.5)


def test_rare_field_agreement_outweighs_common(spark):
    # Two fields with the same m: the near-unique field's agreement
    # must carry a LARGER weight than the 2-value field's.
    rows = [(i, "c%d" % i, "common") for i in range(9)] + [(9, "c0", "common")]
    df = spark.createDataFrame(rows, "id bigint, rare string, dull string")
    scored = fs_score_pairs(
        df, "id", F.lit(1), {"rare": 0.9, "dull": 0.9}
    ).collect()
    # pair (0, 9) agrees on BOTH; pair (0, 1) agrees only on dull.
    both = [r for r in scored if (r.id_a, r.id_b) == (0, 9)][0]
    dull_only = [r for r in scored if (r.id_a, r.id_b) == (0, 1)][0]
    assert both.agree_rare and both.agree_dull
    assert (not dull_only.agree_rare) and dull_only.agree_dull
    # u_rare = 2/90, u_dull = 1 -> ... dull weight ln(0.9/1) < 0 even
    # on agreement; rare agreement is strongly positive.
    u_rare = 2 / 90
    w_rare = math.log(0.9 / u_rare)
    w_dull = math.log(0.9 / 1.0)
    w_rare_dis = math.log(0.1 / (1 - u_rare))
    assert both.score == pytest.approx(w_rare + w_dull, rel=1e-9)
    assert dull_only.score == pytest.approx(w_rare_dis + w_dull, rel=1e-9)
    assert both.score > dull_only.score


def test_block_cap_drops_hot_block(spark):
    rows = [(i, "hot", "v") for i in range(5)] + [
        (10, "cold", "v"),
        (11, "cold", "v"),
    ]
    df = spark.createDataFrame(rows, "id bigint, blk string, f string")
    capped = fs_score_pairs(
        df, "id", F.col("blk"), {"f": 0.9}, max_block=4
    ).collect()
    assert {(r.id_a, r.id_b) for r in capped} == {(10, 11)}


def test_null_field_agreement_is_null_safe(spark):
    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "x")], "id bigint, f string"
    )
    scored = {
        (r.id_a, r.id_b): r.agree_f
        for r in fs_score_pairs(df, "id", F.lit(1), {"f": 0.9}).collect()
    }
    assert scored[(1, 2)] is True  # two NULLs agree (documented)
    assert scored[(1, 3)] is False


def test_bad_m_rejected(spark):
    df = spark.createDataFrame([(1, "x")], "id bigint, f string")
    with pytest.raises(ValueError, match="m for 'f'"):
        fs_score_pairs(df, "id", F.lit(1), {"f": 1.0})


def test_degenerate_fields_clamp_not_null(spark):
    """ADVICE r10: an all-distinct field (u -> 0) and a constant field
    (u -> 1) must yield FINITE clamped scores, matching the clamp the
    oracles now mirror (LEAST(GREATEST(COALESCE(u,eps),eps),1-eps))."""
    rows = [(1, "a", "same"), (2, "b", "same"), (3, "c", "same")]
    df = spark.createDataFrame(rows, "id bigint, uniq string, const string")
    scored = fs_score_pairs(
        df, "id", F.lit(1), {"uniq": 0.9, "const": 0.9}
    ).collect()
    eps = 1e-9
    # every pair: disagrees on uniq (u clamped to eps -> weight
    # ln(0.1/(1-eps))), agrees on const (u clamped to 1-eps -> weight
    # ln(0.9/(1-eps))).
    expect = math.log(0.1 / (1 - eps)) + math.log(0.9 / (1 - eps))
    assert len(scored) == 3
    for r in scored:
        assert r.score is not None and math.isfinite(r.score)
        assert r.score == pytest.approx(expect, rel=1e-9)


def test_oracle_clamp_expression_matches_duckdb():
    """The SQL clamp mirrored into the ER oracles must saturate 0, 1,
    and NULL exactly like operators/er.fs_score_pairs' Column clamp."""
    import duckdb

    got = duckdb.sql(
        "SELECT LEAST(GREATEST(COALESCE(u, 1e-9), 1e-9), 1 - 1e-9) "
        "FROM (VALUES (0.0), (1.0), (NULL), (0.5)) t(u)"
    ).fetchall()
    assert [r[0] for r in got] == [1e-9, 1 - 1e-9, 1e-9, 0.5]


# --- survivorship / golden records ---

from etl_mudah_spark.operators.er import golden_records  # noqa: E402


def test_golden_records_mode_and_tiebreak(spark):
    rows = [
        # cluster 1: brand mode B (2 of 3); size ties {5, 7} -> min 5.
        (1, "B", 5), (1, "B", 7), (1, "A", 5),
        # cluster 2: unanimous.
        (2, "C", 9), (2, "C", 9),
    ]
    df = spark.createDataFrame(rows, "cluster_id long, brand string, size long")
    out = {
        r.cluster_id: r
        for r in golden_records(df, "cluster_id", ["brand", "size"]).collect()
    }
    c1 = out[1]
    assert c1.n_members == 3
    assert c1.golden_brand == "B" and c1.n_distinct_brand == 2
    assert c1.golden_size == 5 and c1.n_distinct_size == 2
    c2 = out[2]
    assert c2.n_members == 2
    assert c2.golden_brand == "C" and c2.n_distinct_brand == 1
    assert c2.golden_size == 9 and c2.n_distinct_size == 1


def test_golden_records_string_tiebreak_is_min(spark):
    # counts tie 1-1: the golden value must be the lexicographic min,
    # never a partition-order accident.
    df = spark.createDataFrame(
        [(1, "zeta"), (1, "alpha")], "cluster_id long, v string"
    )
    r = golden_records(df, "cluster_id", ["v"]).first()
    assert r.golden_v == "alpha" and r.n_distinct_v == 2
