"""SCD2 history collapse: version boundaries, validity chain, null
semantics — pinned on a hand-built change log."""

from __future__ import annotations

from datetime import datetime

from etl_mudah_spark.operators.scd import scd2_collapse


def _ts(day: int) -> datetime:
    return datetime(2024, 1, day)


def test_scd2_versions_and_validity_chain(spark):
    log = spark.createDataFrame(
        [
            (1, "A", _ts(1), 10),
            (1, "A", _ts(2), 11),  # same attr -> same version
            (1, "B", _ts(3), 12),  # change -> v2
            (1, "A", _ts(5), 13),  # back to A -> v3 (runs, not values)
            (2, "X", _ts(1), 20),  # second key independent
        ],
        "k int, attr string, ts timestamp, seq int",
    )
    rows = {
        (r["k"], r["version"]): r
        for r in scd2_collapse(
            log, ["k"], ["attr"], "ts", tiebreak_cols=["seq"]
        ).collect()
    }
    assert len(rows) == 4
    v1, v2, v3 = rows[(1, 1)], rows[(1, 2)], rows[(1, 3)]
    assert (v1["attr"], v1["n_rows"]) == ("A", 2)
    assert (v2["attr"], v2["n_rows"]) == ("B", 1)
    assert (v3["attr"], v3["n_rows"]) == ("A", 1)
    # validity chain: each valid_to equals the next valid_from; open end
    assert v1["valid_from"] == _ts(1) and v1["valid_to"] == _ts(3)
    assert v2["valid_to"] == _ts(5)
    assert v3["valid_to"] is None
    assert rows[(2, 1)]["valid_to"] is None


def test_scd2_null_attr_is_a_value_not_a_boundary(spark):
    """eqNullSafe semantics: NULL -> NULL is NOT a version change, but
    value -> NULL is."""
    log = spark.createDataFrame(
        [(1, None, _ts(1)), (1, None, _ts(2)), (1, "A", _ts(3))],
        "k int, attr string, ts timestamp",
    )
    got = sorted(
        (r["version"], r["attr"], r["n_rows"])
        for r in scd2_collapse(log, ["k"], ["attr"], "ts").collect()
    )
    assert got == [(1, None, 2), (2, "A", 1)]
