"""HLL sketch: accuracy envelope, determinism, and the merge laws
(associative/commutative/idempotent union-max) that make the register
table a shippable, incrementally-maintainable artifact."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_mudah_spark.operators.sketch import (
    hll_distinct,
    hll_estimate_from_registers,
    hll_merge_registers,
    hll_registers,
)


def _ids(spark, lo, hi, group="g"):
    return spark.range(lo, hi).select(
        F.lit(group).alias("grp"), F.col("id").alias("k")
    )


def test_hll_accuracy_within_envelope(spark):
    # m=256 -> sigma ~ 1.04/16 = 6.5%; assert a loose bound at a few
    # cardinalities ABOVE the 5/2*m = 640 linear-counting range (below
    # it the raw estimator is biased high by design — the operator
    # documents that it omits the ln-based correction because ln is
    # libm-specific and would break cross-engine oracle parity).
    for n in (1_000, 5_000, 20_000):
        df = _ids(spark, 0, n)
        [row] = hll_distinct(df, ["grp"], "k").collect()
        assert abs(row["hll_distinct"] - n) / n < 0.25, (n, row)


def test_hll_deterministic_and_repartition_invariant(spark):
    df = _ids(spark, 0, 5_000)
    a = hll_distinct(df, ["grp"], "k").collect()
    b = hll_distinct(df.repartition(17), ["grp"], "k").collect()
    # power-of-two harmonic terms => the sum is exact, so ANY
    # partitioning/aggregation order gives the identical double
    assert a == b


def test_hll_merge_equals_union_sketch_exactly(spark):
    a, b = _ids(spark, 0, 3_000), _ids(spark, 2_000, 6_000)  # overlap
    merged = hll_merge_registers(
        hll_registers(a, ["grp"], "k"),
        hll_registers(b, ["grp"], "k"),
        ["grp"],
    )
    direct = hll_registers(a.unionByName(b), ["grp"], "k")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )
    # and therefore identical estimates
    em = hll_estimate_from_registers(merged, ["grp"]).collect()
    ed = hll_estimate_from_registers(direct, ["grp"]).collect()
    assert em == ed


def test_hll_merge_idempotent(spark):
    reg = hll_registers(_ids(spark, 0, 1_000), ["grp"], "k")
    again = hll_merge_registers(reg, reg, ["grp"])
    assert sorted(map(tuple, again.collect())) == sorted(
        map(tuple, reg.collect())
    )


def test_hll_register_state_is_bounded(spark):
    # whatever the cardinality, <= 256 registers per group
    df = _ids(spark, 0, 50_000, "a").unionByName(_ids(spark, 0, 123, "b"))
    reg = hll_registers(df, ["grp"], "k")
    sizes = {r["grp"]: r["n"] for r in
             reg.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert sizes["a"] <= 256 and sizes["b"] <= 256


def test_cms_never_undercounts_and_is_tight_when_wide(spark):
    """A zipf-ish stream: estimate >= truth for EVERY key, and with
    width >> keys the estimate is exactly the truth."""
    from pyspark.sql import functions as F

    from etl_mudah_spark.operators.sketch import cms_counters, cms_estimate

    rows = [(k,) for k in range(50) for _ in range(50 - k)]  # key k appears 50-k times
    df = spark.createDataFrame(rows, "k bigint").withColumn("g", F.lit("x"))
    counters = cms_counters(df, ["g"], "k", width=1024, depth=4)
    keys = df.select("g", "k").distinct()
    got = {
        r["k"]: r["cms_count"]
        for r in cms_estimate(counters, keys, ["g"], "k", width=1024, depth=4).collect()
    }
    for k in range(50):
        assert got[k] >= 50 - k
        assert got[k] == 50 - k  # wide sketch, tiny key space: exact


def test_cms_overcounts_bounded_under_collision_pressure(spark):
    """Squeeze 2000 uniform keys into width 64: the classic bound says
    est - truth <= ~2n/width with prob 1 - 2^-depth per key; assert the
    MEAN overcount stays within the bound and no key undercounts."""
    from pyspark.sql import functions as F

    from etl_mudah_spark.operators.sketch import cms_counters, cms_estimate

    n = 2000
    df = spark.range(n).select(F.col("id").alias("k"), F.lit("x").alias("g"))
    counters = cms_counters(df, ["g"], "k", width=64, depth=4)
    est = cms_estimate(
        counters, df.select("g", "k"), ["g"], "k", width=64, depth=4
    ).collect()
    overs = [r["cms_count"] - 1 for r in est]
    assert len(est) == n
    assert min(overs) >= 0
    assert sum(overs) / n <= 2 * n / 64


def test_cms_merge_equals_one_shot(spark):
    """Linear-sketch law: sketch(A) + sketch(B) == sketch(A ∪ B),
    cell for cell — so daily partials roll up exactly."""
    from pyspark.sql import functions as F

    from etl_mudah_spark.operators.sketch import cms_counters, cms_merge_counters

    a = spark.range(0, 300).select((F.col("id") % 40).alias("k"), F.lit("x").alias("g"))
    b = spark.range(300, 1000).select((F.col("id") % 97).alias("k"), F.lit("x").alias("g"))
    merged = cms_merge_counters(
        cms_counters(a, ["g"], "k", width=128, depth=3),
        cms_counters(b, ["g"], "k", width=128, depth=3),
        ["g"],
    )
    whole = cms_counters(a.unionByName(b), ["g"], "k", width=128, depth=3)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_hll_inclusion_exclusion_intersection(spark):
    """Set algebra on sketches: |A∩B| ≈ |A|+|B|−|A∪B| from merged
    registers, within the combined p=8 error envelope (~3·1.04/√256 ≈
    20% of the union) on two overlapping ranges."""
    from pyspark.sql import functions as F

    from etl_mudah_spark.operators.sketch import (
        hll_estimate_from_registers,
        hll_merge_registers,
        hll_registers,
    )

    a = spark.range(0, 3000).select(F.lit("a").alias("g"), F.col("id").alias("k"))
    b = spark.range(2000, 5000).select(F.lit("b").alias("g"), F.col("id").alias("k"))
    ra = hll_registers(a, ["g"], "k")
    rb = hll_registers(b, ["g"], "k")
    ea = hll_estimate_from_registers(ra, ["g"]).collect()[0]["hll_distinct"]
    eb = hll_estimate_from_registers(rb, ["g"]).collect()[0]["hll_distinct"]
    merged = hll_merge_registers(
        ra.withColumn("g", F.lit("u")), rb.withColumn("g", F.lit("u")), ["g"]
    )
    eu = hll_estimate_from_registers(merged, ["g"]).collect()[0]["hll_distinct"]
    inter = ea + eb - eu
    assert abs(eu - 5000) / 5000 < 0.2
    assert abs(inter - 1000) < 0.2 * 5000  # envelope scales with the union


# --- fixed-bin histogram sketch: mergeable quantiles ---

import pytest
from etl_mudah_spark.operators.sketch import (  # noqa: E402
    histogram_counters,
    histogram_quantiles,
)


def test_histogram_quantiles_uniform_interpolation(spark):
    # 100 values 0.5, 1.5, ..., 99.5 in 10 bins of width 10: each bin
    # holds 10. Median target t = 50 -> bin 4 (cum 50), position
    # (50-40)/10 = 1.0 -> est = 40 + 10*1 = 50. p90 -> bin 8 (cum 90),
    # est = 90.
    df = spark.createDataFrame([(i + 0.5,) for i in range(100)], "v double")
    ctr = histogram_counters(df, "v", lo=0.0, width=10.0, n_bins=10)
    r = histogram_quantiles(
        ctr, lo=0.0, width=10.0, quantiles=((1, 2), (9, 10))
    ).first()
    assert r.n == 100
    assert r.est_1_2 == pytest.approx(50.0)
    assert r.est_9_10 == pytest.approx(90.0)


def test_histogram_merge_is_addition(spark):
    a = spark.createDataFrame([(float(i),) for i in range(0, 50)], "v double")
    b = spark.createDataFrame([(float(i),) for i in range(50, 100)], "v double")
    both = a.unionByName(b)
    build = lambda df: histogram_counters(df, "v", 0.0, 10.0, 10)  # noqa: E731
    merged = (
        build(a)
        .unionByName(build(b))
        .groupBy("bin")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )
    direct = {(r.bin, r.cnt) for r in build(both).collect()}
    rolled = {(r.bin, r.cnt) for r in merged.collect()}
    assert direct == rolled
    qa = histogram_quantiles(merged, 0.0, 10.0, ((1, 2),)).first()
    qb = histogram_quantiles(build(both), 0.0, 10.0, ((1, 2),)).first()
    assert qa.est_1_2 == qb.est_1_2


def test_histogram_error_bound_one_width(spark):
    import random

    rng = random.Random(7)
    vals = [rng.uniform(0, 100) for _ in range(500)]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    ctr = histogram_counters(df, "v", 0.0, 10.0, 10)
    r = histogram_quantiles(
        ctr, 0.0, 10.0, ((1, 2), (19, 20))
    ).first()
    s = sorted(vals)
    # exact lower quantiles
    exact_p50 = s[next(i for i in range(len(s)) if 2 * (i + 1) >= len(s))]
    exact_p95 = s[next(i for i in range(len(s)) if 20 * (i + 1) >= 19 * len(s))]
    assert abs(r.est_1_2 - exact_p50) < 10.0
    assert abs(r.est_19_20 - exact_p95) < 10.0


def test_histogram_clamps_out_of_range_and_rejects_bad_q(spark):
    df = spark.createDataFrame([(-5.0,), (1000.0,), (5.0,)], "v double")
    ctr = histogram_counters(df, "v", 0.0, 10.0, 10)
    rows = {r.bin: r.cnt for r in ctr.collect()}
    assert rows[0] == 2 and rows[9] == 1  # -5 clamps low, 1000 clamps high
    with pytest.raises(ValueError):
        histogram_quantiles(ctr, 0.0, 10.0, ((0, 2),))
