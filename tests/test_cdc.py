"""CDC snapshot diff (operators/cdc.py): table_diff classification,
null-safety, image columns, single-join plan shape, and the
manifest-version integration."""

import pytest
from pyspark.sql import functions as F

from etl_mudah_spark.operators.cdc import manifest_diff, table_diff
from etl_mudah_spark.operators.manifest import manifest_publish


@pytest.fixture()
def snapshots(spark):
    old = spark.createDataFrame(
        [
            (1, "a", 10),   # unchanged
            (2, "b", 20),   # value update
            (3, None, 30),  # NULL -> value update
            (4, "d", 40),   # delete
            (5, None, 50),  # NULL == NULL: unchanged
        ],
        "k int, attr string, other int",
    )
    new = spark.createDataFrame(
        [
            (1, "a", 99),    # 'other' not compared -> unchanged
            (2, "B", 20),
            (3, "c", 30),
            (5, None, 50),
            (6, "f", 60),    # insert
        ],
        "k int, attr string, other int",
    )
    return old, new


def test_table_diff_classification_and_images(spark, snapshots):
    old, new = snapshots
    rows = {
        r["k"]: r
        for r in table_diff(old, new, ["k"], compare_cols=["attr"]).collect()
    }
    assert set(rows) == {2, 3, 4, 6}
    assert rows[2]["change_type"] == "update"
    assert (rows[2]["old_attr"], rows[2]["new_attr"]) == ("b", "B")
    assert rows[3]["change_type"] == "update"  # NULL -> 'c' is a change
    assert rows[3]["old_attr"] is None and rows[3]["new_attr"] == "c"
    assert rows[4]["change_type"] == "delete" and rows[4]["new_attr"] is None
    assert rows[6]["change_type"] == "insert" and rows[6]["old_attr"] is None


def test_table_diff_default_compares_all_shared_nonkey_cols(spark, snapshots):
    old, new = snapshots
    rows = {r["k"]: r for r in table_diff(old, new, ["k"]).collect()}
    # with 'other' compared too, key 1 (other 10 -> 99) becomes an update
    assert rows[1]["change_type"] == "update"
    assert (rows[1]["old_other"], rows[1]["new_other"]) == (10, 99)


def test_table_diff_no_images_keeps_narrow_schema(spark, snapshots):
    old, new = snapshots
    out = table_diff(old, new, ["k"], compare_cols=["attr"], include_images=False)
    assert out.columns == ["k", "change_type"]
    assert {r["k"] for r in out.collect()} == {2, 3, 4, 6}


def test_table_diff_is_one_join_no_extra_shuffle(spark, snapshots):
    # the diff is ONE full-outer join: images ride the same join, they
    # do not cost a second one
    old, new = snapshots
    plan = (
        table_diff(old, new, ["k"], compare_cols=["attr"])
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan.count("Join FullOuter") == 1
    assert plan.count("Join") == 1


def test_manifest_diff_between_retained_versions(spark, tmp_path):
    base = str(tmp_path / "tbl")
    v1 = spark.createDataFrame([(1, "a"), (2, "b")], "k int, attr string")
    v2 = spark.createDataFrame([(1, "a"), (2, "B"), (3, "c")], "k int, attr string")
    manifest_publish(base, lambda d: v1.write.parquet(d), keep=1)
    manifest_publish(base, lambda d: v2.write.parquet(d), keep=1)
    rows = {
        r["k"]: r["change_type"]
        for r in manifest_diff(spark, base, ["k"]).collect()
    }
    assert rows == {2: "update", 3: "insert"}


def test_manifest_diff_pruned_version_raises(spark, tmp_path):
    base = str(tmp_path / "tbl")
    df = spark.createDataFrame([(1, "a")], "k int, attr string")
    manifest_publish(base, lambda d: df.write.parquet(d), keep=0)
    with pytest.raises(ValueError, match="no retained version older"):
        manifest_diff(spark, base, ["k"])
    with pytest.raises(ValueError, match="not on disk"):
        manifest_diff(spark, base, ["k"], from_version=99)


# ---------------------------------------------------------------------------
# Round-trip property: apply_diff(old, table_diff(old, new)) == new on
# the compared columns, for ARBITRARY snapshot pairs (hypothesis).
# ---------------------------------------------------------------------------
from hypothesis import HealthCheck, given, settings, strategies as st  # noqa: E402

from etl_mudah_spark.operators.cdc import apply_diff  # noqa: E402

_val = st.one_of(st.none(), st.text(alphabet="abcN", max_size=2))
_snap = st.dictionaries(st.integers(0, 15), _val, max_size=12)


@given(old=_snap, new=_snap)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_apply_diff_reconstructs_new_snapshot(spark, old, new):
    schema = "k int, attr string"
    old_df = spark.createDataFrame(list(old.items()) or [(None, None)], schema)
    new_df = spark.createDataFrame(list(new.items()) or [(None, None)], schema)
    if not old:
        old_df = old_df.where(F.lit(False))
    if not new:
        new_df = new_df.where(F.lit(False))
    d = table_diff(old_df, new_df, ["k"], compare_cols=["attr"])
    rebuilt = {
        r["k"]: r["attr"] for r in apply_diff(old_df, d, ["k"]).collect()
    }
    assert rebuilt == new
