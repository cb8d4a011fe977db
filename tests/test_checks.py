"""Data-quality constraint suite (operators/checks.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_mudah_spark.operators.checks import (
    RowCheck,
    UniqueCheck,
    check_table,
    fail_on_violations,
    in_range,
    in_set,
    matches,
    not_null,
)


@pytest.fixture(scope="module")
def messy(spark):
    return spark.createDataFrame(
        [
            (1, "ok@x.com", 10.0, "A"),
            (2, None, -5.0, "A"),        # null email, negative price
            (2, "dup@x.com", 20.0, "B"),  # duplicate id
            (3, "bad-email", 30.0, "Z"),  # bad regex, bad status
            (4, "four@x.com", None, "B"),  # null price passes in_range
        ],
        "id int, email string, price double, status string",
    )


def _report(df):
    return {
        r["check"]: (r["violations"], r["passed"]) for r in df.collect()
    }


def test_row_and_unique_checks(messy):
    rep = check_table(
        messy,
        row_checks=[
            not_null("email"),
            in_range("price", 0, 100),
            in_set("status", ["A", "B"]),
            matches("email", r"^[^@]+@[^@]+$"),
        ],
        unique_checks=[UniqueCheck(("id",))],
    )
    got = _report(rep)
    assert got["not_null(email)"] == (1, False)
    assert got["in_range(price)"] == (1, False)  # NULL price passes
    assert got["in_set(status)"] == (1, False)
    assert got["matches(email)"] == (1, False)  # NULL email passes regex
    assert got["unique(id)"] == (1, False)  # one excess row for id=2
    assert all(r["total_rows"] == 5 for r in rep.collect())


def test_custom_predicate_and_null_predicate_counts_as_violation(spark):
    df = spark.createDataFrame(
        [(1, 2), (3, None), (5, 1)], "a int, b int"
    )
    rep = check_table(
        df, row_checks=[RowCheck("a_lt_b", "a", F.col("a") < F.col("b"))]
    )
    # 3 < NULL evaluates NULL -> violation; 5 < 1 false -> violation
    assert _report(rep)["a_lt_b"] == (2, False)


def test_single_scan_for_all_row_checks(messy):
    rep = check_table(
        messy,
        row_checks=[not_null("email"), in_range("price", 0, 100), in_set("status", ["A", "B"])],
    )
    plan = rep._jdf.queryExecution().executedPlan().toString()
    # one aggregate over the source: the scan appears once, not per check
    assert plan.count("LocalTableScan") <= 1


def test_passing_suite_and_circuit_breaker(spark):
    clean = spark.createDataFrame([(1, "a"), (2, "b")], "id int, s string")
    rep = check_table(
        clean,
        row_checks=[not_null("s")],
        unique_checks=[UniqueCheck(("id",))],
    )
    assert all(r["passed"] for r in rep.collect())
    fail_on_violations(rep)  # no raise

    dirty = clean.unionByName(
        spark.createDataFrame([(1, None)], "id int, s string")
    )
    bad = check_table(dirty, row_checks=[not_null("s")], unique_checks=[UniqueCheck(("id",))])
    with pytest.raises(ValueError, match="not_null\\(s\\): 1/3"):
        fail_on_violations(bad)


def test_empty_table_reports_zero_violations(spark):
    empty = spark.createDataFrame([], "id int, s string")
    rep = check_table(
        empty, row_checks=[not_null("s")], unique_checks=[UniqueCheck(("id",))]
    )
    got = _report(rep)
    assert got == {"not_null(s)": (0, True), "unique(id)": (0, True)}


def test_tag_violations_and_quarantine_split(messy):
    from etl_mudah_spark.operators.checks import split_quarantine

    checks = [
        not_null("email"),
        in_range("price", 0, 100),
        in_set("status", ["A", "B"]),
    ]
    clean, rejects = split_quarantine(messy, checks)
    # clean: id 1, the dup id-2 row (duplication is a KEY property, not
    # a row check), and id 4 (null price passes in_range)
    assert clean.count() == 3
    got = {
        (r["id"], r["email"]): sorted(r["violated"])
        for r in rejects.collect()
    }
    assert got[(2, None)] == ["in_range(price)", "not_null(email)"]
    assert got[(3, "bad-email")] == ["in_set(status)"]
    assert "violated" not in clean.columns
    # tagging is a projection, not a join/shuffle
    plan = rejects._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_fk_violations_and_report(spark):
    from etl_mudah_spark.operators.checks import (
        check_table,
        fk_check_report,
        fk_violations,
    )

    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk int")
    child = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 9), (13, None), (14, 9)],
        "id int, fk int",
    )
    bad = fk_violations(child, ["fk"], parent, ["pk"])
    assert sorted(r["id"] for r in bad.collect()) == [12, 14]  # NULL fk legal
    rep = fk_check_report(child, ["fk"], parent, ["pk"])
    row = rep.first()
    assert (row["check"], row["violations"], row["total_rows"], row["passed"]) == (
        "fk(fk)", 2, 5, False
    )
    # composes with the row/uniqueness report into one suite
    combined = check_table(child, row_checks=[not_null("fk")]).unionByName(rep)
    assert combined.count() == 2


# --- functional-dependency audit ---

from etl_mudah_spark.operators.checks import fd_audit  # noqa: E402


def test_fd_audit_holds_and_violations(spark):
    rows = [
        # a -> b holds; b -> c violated in group b=1 (c in {x,x,y}).
        (1, 1, "x"), (2, 1, "x"), (3, 1, "y"), (4, 2, "z"),
    ]
    df = spark.createDataFrame(rows, "a long, b long, c string")
    out = {r.fd: r for r in fd_audit(df, [("a", "b"), ("b", "c")]).collect()}
    holds = out["a->b"]
    assert holds.violating_groups == 0
    assert holds.repair_rows == 0 and holds.g3_error == 0.0
    assert holds.n_lhs_groups == 4 and holds.max_distinct_rhs == 1
    viol = out["b->c"]
    assert viol.n_rows == 4 and viol.n_lhs_groups == 2
    assert viol.violating_groups == 1 and viol.max_distinct_rhs == 2
    # delete the single y-row and b -> c holds.
    assert viol.repair_rows == 1 and viol.g3_error == 0.25


def test_fd_audit_nulls_are_values_and_empty_fds_rejected(spark):
    import pytest

    df = spark.createDataFrame(
        [(1, None), (1, None), (2, "x"), (2, None)], "a long, b string"
    )
    r = fd_audit(df, [("a", "b")]).first()
    # group a=1 agrees on NULL; a=2 splits {x, NULL}.
    assert r.violating_groups == 1 and r.repair_rows == 1
    with pytest.raises(ValueError):
        fd_audit(df, [])
