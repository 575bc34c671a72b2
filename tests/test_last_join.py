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
