"""LAST JOIN semantics (JOIN_CLAUSE.md:5-66; FIXTURES.md F4 shape)."""

import pytest
from pyspark.sql import functions as F

from openmldb_spark.operators.last_join import last_join


@pytest.fixture(scope="module")
def lj(spark):
    left = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id int, col1 string"
    )
    # >=2 rows per key with distinct ts, one duplicated-ts pair, key 'c' missing
    right = spark.createDataFrame(
        [
            (10, "a", 100, 1),
            (11, "a", 200, 2),
            (12, "b", 150, 1),
            (13, "b", 150, 2),  # ts tie with rid=12
        ],
        "rid int, col1 string, std_ts long, seq int",
    )
    return left, right


def test_sorted_last_join_picks_max_ts(spark, lj):
    left, right = lj
    out = last_join(left, right, on="col1", order_by="std_ts", tiebreak="seq",
                    right_prefix="r_").orderBy("id")
    rows = out.collect()
    assert rows[0]["r_rid"] == 11           # a: max ts 200
    assert rows[1]["r_rid"] == 13           # b: ts tie -> max seq wins
    assert rows[2]["r_rid"] is None         # c: left preserved, NULL fill


def test_left_row_count_preserved(spark, lj):
    left, right = lj
    out = last_join(left, right, on="col1", order_by="std_ts", tiebreak="seq")
    assert out.count() == left.count()


def test_unsorted_requires_tiebreak(spark, lj):
    left, right = lj
    with pytest.raises(ValueError):
        last_join(left, right, on="col1")


def test_unsorted_with_tiebreak(spark, lj):
    left, right = lj
    out = last_join(left, right, on="col1", tiebreak="rid", right_prefix="r_").orderBy("id")
    rows = out.collect()
    assert rows[0]["r_rid"] == 11 and rows[1]["r_rid"] == 13


def test_condition_post_filter_plan(spark, lj):
    left, right = lj
    out = last_join(
        left,
        right,
        on="col1",
        order_by="std_ts",
        tiebreak="seq",
        condition=F.col("std_ts") < 200,
        right_prefix="r_",
    ).orderBy("id")
    rows = out.collect()
    assert rows[0]["r_rid"] == 10           # a: 200 filtered out, 100 remains
    assert rows[1]["r_rid"] == 13
    assert rows[2]["r_rid"] is None
    assert out.count() == 3


def test_right_only_condition_takes_dedupe_right_plan(spark, lj):
    """A condition referencing only right columns must NOT pay the fan-out
    post-filter plan (VERDICT r3 item 5): right is pre-filtered, then the
    dedupe-right plan runs — no per-left-row window, no
    monotonically_increasing_id in the physical plan."""
    left, right = lj
    out = last_join(
        left, right, on="col1", order_by="std_ts", tiebreak="seq",
        condition=F.col("std_ts") < 200, right_prefix="r_",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "__omsk_left_id" not in plan
    assert "monotonically_increasing_id" not in plan


def test_two_sided_condition_keeps_post_filter_plan(spark, lj):
    """A genuinely two-sided condition still needs (and gets) the
    post-filter plan, with correct per-left-row semantics."""
    left, right = lj
    out = last_join(
        left, right, on="col1", order_by="std_ts", tiebreak="seq",
        condition=left["id"] * 100 >= right["std_ts"], right_prefix="r_",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "__omsk_left_id" in plan
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["r_rid"] == 10   # a: only ts=100 satisfies 1*100 >= ts
    assert rows[2]["r_rid"] == 13   # b: both satisfy -> ts tie -> max seq
    assert rows[3]["r_rid"] is None


def test_colliding_condition_name(spark):
    """A column name that exists on BOTH sides: a plan-bound right["c"]
    condition is unambiguous (fails left-side analysis by attribute id) and
    takes the fast path; an unbound F.col("c") resolves on both sides, must
    NOT take the shortcut (it would silently bind right), and the general
    plan then correctly refuses the ambiguous reference."""
    left = spark.createDataFrame([(1, "a", 5)], "id int, col1 string, std_ts long")
    right = spark.createDataFrame(
        [(10, "a", 100, 1)], "rid int, col1 string, std_ts long, seq int"
    )
    out = last_join(
        left, right, on="col1", order_by=None, tiebreak="seq",
        condition=right["std_ts"] > 50, right_prefix="r_",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "__omsk_left_id" not in plan
    assert out.collect()[0]["r_rid"] == 10
    with pytest.raises(Exception, match="AMBIGUOUS_REFERENCE"):
        last_join(
            left, right, on="col1", order_by=None, tiebreak="seq",
            condition=F.col("std_ts") > 50, right_prefix="r_",
        ).collect()
