"""Regression tests for the round-5 ADVICE items (fixed in round 6):

1. window_union _wide coercion must widen MONOTONICALLY across union tables
   (int main + double union1 + bigint union2 -> double, not bigint).
2. distinct_count in GROUP BY context counts NULL as its own distinct value
   (matching the window AggSpec path; ref test_udaf_function id 5).
3. LAST JOIN struct-equality keys: date-vs-timestamp keys reconcile (no
   AnalysisException), timestamp-vs-bigint keys compare on epoch MS, and
   string-vs-numeric keys fall back to the generic plan (unparseable strings
   must NOT null-match).
4. window_union timestamp ntz/ltz flavor mismatch coerces with a direct cast.
5. _ts_poly/timestamp(): a digit-only DATE STRING ('20200520') follows the
   parse arm and yields NULL — not TIMESTAMP_MILLIS(20200520).
"""

import datetime

import pytest
from pyspark.sql import functions as F

from openmldb_spark.functions import aggregates as A
from openmldb_spark.operators.window import WindowDef
from openmldb_spark.operators.window_union import window_union
from openmldb_spark.sql import sql


def test_window_union_widening_is_monotone(spark):
    # main int, union1 double, union2 bigint on the same column: the common
    # type must stay double — a later int-family union must not narrow it
    main = spark.createDataFrame([(1, "A", 10, 1000)], "id int, pk string, v int, ts long")
    u1 = spark.createDataFrame([(2, "A", 5.5, 900)], "id int, pk string, v double, ts long")
    u2 = spark.createDataFrame([(3, "A", 7, 800)], "id int, pk string, v long, ts long")
    wd = WindowDef(partition_by=["pk"], order_by="ts", rows_range="10s")
    out = window_union(main, [u1, u2], wd, {"s": A.sum_("v")})
    [row] = out.collect()
    assert abs(row["s"] - 22.5) < 1e-9  # 10 + 5.5 + 7, fraction preserved


def test_window_union_ntz_ltz_flavor(spark):
    ts = datetime.datetime(2020, 5, 22, 10, 0, 0)
    main = spark.createDataFrame([(1, "A", 1, ts)], "id int, pk string, v int, ts timestamp")
    u = spark.createDataFrame(
        [(2, "A", 2, ts - datetime.timedelta(seconds=5))],
        "id int, pk string, v int, ts timestamp_ntz",
    )
    wd = WindowDef(partition_by=["pk"], order_by="ts", rows_range="10s")
    out = window_union(main, [u], wd, {"s": A.sum_("v")})
    [row] = out.collect()
    assert row["s"] == 3


def test_distinct_count_groupby_counts_null(spark):
    df = spark.createDataFrame(
        [("A", 1), ("A", 1), ("A", None), ("B", 2)], "pk string, v int"
    )
    out = sql(
        spark,
        "SELECT pk, distinct_count(v) AS dc FROM t GROUP BY pk",
        {"t": df},
    )
    r = {x["pk"]: x["dc"] for x in out.collect()}
    # NULL is its own distinct value (ref test_udaf_function id 5)
    assert r == {"A": 2, "B": 1}


def test_last_join_date_vs_timestamp_keys(spark):
    d = datetime.date(2020, 5, 22)
    left = spark.createDataFrame([(1, d)], "id int, k date")
    right = spark.createDataFrame(
        [(datetime.datetime(2020, 5, 22, 0, 0, 0), 10, 100),
         (datetime.datetime(2020, 5, 23, 0, 0, 0), 20, 200)],
        "k timestamp, v int, rts long",
    )
    out = sql(
        spark,
        "SELECT t1.id, t2.v FROM t1 LAST JOIN t2 ORDER BY t2.rts "
        "ON t1.k = t2.k",
        {"t1": left, "t2": right},
    )
    [row] = out.collect()
    assert row["v"] == 10  # date midnight == timestamp midnight


def test_last_join_timestamp_vs_bigint_ms_keys(spark):
    ms = 1590115420000
    left = spark.createDataFrame(
        [(1, datetime.datetime.utcfromtimestamp(ms / 1000))], "id int, k timestamp"
    )
    right = spark.createDataFrame(
        [(ms, 7, 1), (ms + 1000, 8, 2)], "k long, v int, rts long"
    )
    out = sql(
        spark,
        "SELECT t1.id, t2.v FROM t1 LAST JOIN t2 ORDER BY t2.rts "
        "ON t1.k = t2.k",
        {"t1": left, "t2": right},
    )
    [row] = out.collect()
    assert row["v"] == 7  # epoch-ms comparison, not seconds-vs-ms


def test_last_join_string_vs_numeric_falls_back(spark):
    # unparseable string keys must NOT silently match numeric-NULL keys
    left = spark.createDataFrame([(1, "xyz"), (2, "5")], "id int, k string")
    right = spark.createDataFrame(
        [(5, 50, 1), (None, 99, 2)], "k int, v int, rts long"
    )
    out = sql(
        spark,
        "SELECT t1.id, t2.v FROM t1 LAST JOIN t2 ORDER BY t2.rts "
        "ON t1.k = t2.k",
        {"t1": left, "t2": right},
    )
    r = {x["id"]: x["v"] for x in out.collect()}
    assert r[2] == 50
    assert r[1] is None  # 'xyz' matches nothing — NOT the NULL-key row


def test_timestamp_of_digit_date_string_is_null(spark):
    df = spark.createDataFrame([("20200520",)], "s string")
    out = sql(spark, "SELECT timestamp(s) AS t, month(s) AS m FROM t", {"t": df})
    [row] = out.collect()
    assert row["t"] is None and row["m"] is None


def test_timestamp_of_bigint_is_epoch_ms(spark):
    df = spark.createDataFrame([(1590115420000,)], "v long")
    out = sql(spark, "SELECT timestamp(v) AS t FROM t", {"t": df})
    [row] = out.collect()
    assert row["t"] == datetime.datetime(2020, 5, 22, 2, 43, 40)
