"""Deterministic sampling / domain-mixing operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_mudah_spark.operators.sampling import (
    keymod_flag,
    keymod_sample,
    stratified_topn,
)


def _df(spark):
    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(200)]
    return spark.createDataFrame(rows, "id bigint, grp string")


def test_keymod_sample_exact_rule(spark):
    df = _df(spark)
    w = F.when(F.col("grp") == "a", F.lit(1.0)).otherwise(F.lit(0.3))
    kept = keymod_sample(df, "id", w, buckets=10).collect()
    for r in kept:
        if r["grp"] == "b":
            assert r["id"] % 10 < 3
    ids = {r["id"] for r in kept}
    assert all(i in ids for i in range(0, 200, 2))  # weight 1.0 keeps all
    # weight 0.3 keeps exactly the 0/1/2 residues of the odd ids
    assert {i for i in ids if i % 2 == 1} == {
        i for i in range(1, 200, 2) if i % 10 < 3
    }


def test_keymod_sample_is_stable_under_growth(spark):
    """Growing the corpus must not flip any old row's decision."""
    df = _df(spark)
    w = F.lit(0.5)
    before = {r["id"] for r in keymod_sample(df, "id", w).collect()}
    grown = spark.createDataFrame(
        [(i, "c") for i in range(200, 400)], "id bigint, grp string"
    )
    after = {
        r["id"]
        for r in keymod_sample(df.unionByName(grown), "id", w).collect()
    }
    assert before == {i for i in after if i < 200}


def test_keymod_is_map_only(spark):
    plan = (
        keymod_sample(_df(spark), "id", F.lit(0.5))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_stratified_topn(spark):
    out = stratified_topn(_df(spark), "grp", 5, "id").collect()
    by_grp: dict[str, list[int]] = {}
    for r in out:
        by_grp.setdefault(r["grp"], []).append(r["id"])
    assert sorted(by_grp["a"]) == [0, 2, 4, 6, 8]
    assert sorted(by_grp["b"]) == [1, 3, 5, 7, 9]
    assert "_rn" not in {f.name for f in stratified_topn(_df(spark), "grp", 5, "id").schema.fields}


def test_flag_matches_sample(spark):
    df = _df(spark)
    w = F.lit(0.7)
    flagged = {
        r["id"]
        for r in df.select("id", keymod_flag("id", w).alias("k")).collect()
        if r["k"]
    }
    sampled = {r["id"] for r in keymod_sample(df, "id", w).collect()}
    assert flagged == sampled


def test_md5_global_order_matches_single_window(spark):
    """The bucketed two-phase global row number equals the naive
    single-task ROW_NUMBER() OVER (ORDER BY md5(key), key)."""
    from pyspark.sql import Window

    from etl_mudah_spark.operators.sampling import md5_global_order

    df = spark.range(0, 307).withColumnRenamed("id", "k")
    got = {r["k"]: r["rn"] for r in md5_global_order(df, "k").collect()}
    w = Window.orderBy(F.md5(F.col("k").cast("string")), "k")
    want = {
        r["k"]: r["rn"]
        for r in df.withColumn("rn", F.row_number().over(w)).collect()
    }
    assert got == want
    assert sorted(got.values()) == list(range(1, 308))


def test_token_budget_mix_keeps_under_budget_and_downsamples_over(spark):
    from etl_mudah_spark.operators.sampling import token_budget_mix

    # big: ids 0..399 (4 full mod-100 cycles -> exact keymod fractions),
    # small: ids far away in key space, trivially under budget
    rows = [(i, "big", 10) for i in range(400)] + [
        (10_000 + i, "small", 10) for i in range(50)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, n_tok bigint")
    budget = F.when(F.col("source") == "small", F.lit(10_000)).otherwise(
        F.lit(2_000)  # big stratum supplies 4000 tokens -> rate 0.5
    )
    out = token_budget_mix(
        df, "doc_id", "source", "n_tok", budget, buckets=100
    ).collect()
    small = [r for r in out if r["source"] == "small"]
    big = [r for r in out if r["source"] == "big"]
    assert all(r["_kept"] for r in small)  # under budget: keep all
    kept_big = {r["doc_id"] for r in big if r["_kept"]}
    # rate 0.5 -> exactly keys with doc_id % 100 < 50, half of each cycle
    assert kept_big == {i for i in range(400) if i % 100 < 50}


def test_token_budget_mix_is_append_stable(spark):
    """A key kept at one corpus snapshot stays kept after appending
    docs to OTHER strata (its stratum total unchanged)."""
    from etl_mudah_spark.operators.sampling import token_budget_mix

    base = [(i, "a", 7) for i in range(200)]
    extra = [(1000 + i, "b", 5) for i in range(100)]
    budget = F.lit(700)  # a supplies 1400 -> rate 0.5
    schema = "doc_id bigint, source string, n_tok bigint"

    def kept_a(rows):
        df = spark.createDataFrame(rows, schema)
        out = token_budget_mix(df, "doc_id", "source", "n_tok", budget).collect()
        return {r["doc_id"] for r in out if r["source"] == "a" and r["_kept"]}

    assert kept_a(base) == kept_a(base + extra)


def test_token_budget_mix_preserves_null_stratum_rows(spark):
    """Rows with a NULL stratum come back flagged _kept=false instead
    of silently vanishing in the totals join."""
    from etl_mudah_spark.operators.sampling import token_budget_mix

    rows = [(0, "a", 5), (1, "a", 5), (2, None, 5)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, n_tok bigint")
    out = token_budget_mix(df, "doc_id", "source", "n_tok", F.lit(100)).collect()
    assert len(out) == 3
    null_row = [r for r in out if r["source"] is None]
    assert len(null_row) == 1 and null_row[0]["_kept"] is False
    assert all(r["_kept"] for r in out if r["source"] == "a")


def test_token_budget_mix_degenerate_inputs(spark):
    """Empty frame -> empty out; a zero-token stratum keeps its rows
    (0 * anything < positive budget) rather than dividing by zero."""
    from etl_mudah_spark.operators.sampling import token_budget_mix

    schema = "doc_id bigint, source string, n_tok bigint"
    empty = spark.createDataFrame([], schema)
    assert token_budget_mix(empty, "doc_id", "source", "n_tok", F.lit(10)).count() == 0
    zero = spark.createDataFrame([(1, "a", 0)], schema)
    out = token_budget_mix(zero, "doc_id", "source", "n_tok", F.lit(10)).collect()
    assert len(out) == 1 and out[0]["_kept"] is True


def test_weighted_sample_topn_matches_python_oracle(spark):
    """A-ES with the LCG derandomization is exactly reproducible in
    plain Python: same keys, same top-n, same order."""
    import math

    from etl_mudah_spark.operators.sampling import (
        LCG_A,
        LCG_C,
        LCG_M,
        weighted_sample_topn,
    )

    rows = [(i, float(1 + (i * 7) % 50)) for i in range(200)]
    df = spark.createDataFrame(rows, "k bigint, w double")

    def key(i, w):
        u = ((i * LCG_A + LCG_C) % LCG_M + 1) / (LCG_M + 1)
        return math.log(u) / w

    expected = sorted(rows, key=lambda r: (-key(*r), r[0]))[:25]
    got = weighted_sample_topn(df, "k", F.col("w"), 25).collect()
    assert [(r["k"], r["w"]) for r in got] == expected
    # reproducible: a second run returns the identical sample
    again = weighted_sample_topn(df, "k", F.col("w"), 25).collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in got]


def test_weighted_sample_topn_weight_monotonicity(spark):
    """Inclusion tracks weight: a row with overwhelming weight is
    always sampled; with uniform weights the sample is the plain
    LCG-order top-n (weight cancels)."""
    from etl_mudah_spark.operators.sampling import weighted_sample_topn

    rows = [(i, 1.0 if i != 42 else 1e9) for i in range(100)]
    df = spark.createDataFrame(rows, "k bigint, w double")
    got = {r["k"] for r in weighted_sample_topn(df, "k", F.col("w"), 10).collect()}
    assert 42 in got

    uni = spark.createDataFrame([(i, 3.0) for i in range(100)], "k bigint, w double")
    a = [r["k"] for r in weighted_sample_topn(uni, "k", F.lit(3.0), 10).collect()]
    b = [r["k"] for r in weighted_sample_topn(uni, "k", F.lit(7.0), 10).collect()]
    assert a == b  # constant weights cancel out of the ranking


def test_stratified_topn_salted_equals_one_phase(spark):
    """The two-phase salted rank composes losslessly: on a skewed
    frame (one hot stratum with 5k rows, several tiny ones) it returns
    EXACTLY the one-phase window's rows, for several n and salt
    counts."""
    from etl_mudah_spark.operators.sampling import (
        lcg_uniform,
        stratified_topn,
        stratified_topn_salted,
    )

    rows = [(i, "hot") for i in range(5000)] + [
        (10_000 + i, f"s{i % 7}") for i in range(70)
    ]
    df = (
        spark.createDataFrame(rows, "k bigint, grp string")
        .withColumn("u", lcg_uniform(F.col("k")))
    )
    for n in (1, 5, 40):
        for n_salts in (2, 16):
            two = stratified_topn_salted(
                df, "grp", n, order_col="u", tiebreak_col="k",
                n_salts=n_salts,
            )
            one = stratified_topn(df, "grp", n, "u")
            assert sorted(map(tuple, two.collect())) == sorted(
                map(tuple, one.collect())
            ), (n, n_salts)


def test_rendezvous_minimal_movement_and_balance(spark):
    """The HRW guarantees: (1) removing a shard moves ONLY that
    shard's keys — every other key keeps its assignment (each
    surviving shard's weight is unchanged); (2) assignment is roughly
    balanced; (3) adding the shard back restores the original routing
    exactly (pure function of (key, topology))."""
    from etl_mudah_spark.operators.sampling import rendezvous_assign

    four = [("a", 11), ("b", 22), ("c", 33), ("d", 44)]
    three = four[:3]
    df = spark.range(0, 4000).select(F.col("id").alias("k"))
    with4 = {r["k"]: r["shard"] for r in rendezvous_assign(df, "k", four).collect()}
    with3 = {r["k"]: r["shard"] for r in rendezvous_assign(df, "k", three).collect()}
    for k, s in with4.items():
        if s != "d":
            assert with3[k] == s, k  # survivors never move
        else:
            assert with3[k] in {"a", "b", "c"}
    # balance: each shard within 3x of fair share (loose, deterministic)
    from collections import Counter

    c4 = Counter(with4.values())
    assert set(c4) == {"a", "b", "c", "d"}
    for n in c4.values():
        assert 4000 / 12 < n < 4000 / 4 * 3
    # re-adding d restores the original assignment bit-for-bit
    again = {r["k"]: r["shard"] for r in rendezvous_assign(df, "k", four).collect()}
    assert again == with4


def test_grouped_bucketed_running_sum_equals_one_window_form(spark):
    """grouped_bucketed_running_sum must equal SUM(val) OVER (PARTITION
    BY group ORDER BY id) row for row — the decomposition is exact,
    including across bucket boundaries and for groups whose rows land
    in a single bucket."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from etl_mudah_spark.operators.sampling import (
        grouped_bucketed_running_sum,
    )

    rows = [(g, i, (i * 7 + ord(g) * 3) % 11 + 1) for g in ("a", "b", "c")
            for i in range(0, 40, 2 if g == "b" else 1)]
    df = spark.createDataFrame(rows, "g string, id bigint, v bigint")
    got = {
        (r.g, r.id): r.cum
        for r in grouped_bucketed_running_sum(
            df, ["g"], F.floor(F.col("id") / 7).cast("bigint"),
            [F.col("id")], F.col("v")
        ).collect()
    }
    want = {
        (r.g, r.id): r.cum
        for r in df.withColumn(
            "cum", F.sum("v").over(W.partitionBy("g").orderBy("id"))
        ).collect()
    }
    assert got == want
