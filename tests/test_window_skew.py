"""Skew-split windows must be exactly equal to the plain window path."""

import pytest
from pyspark.sql import functions as F

from openmldb_spark.functions import aggregates as A
from openmldb_spark.operators.window import WindowDef, window_agg
from openmldb_spark.operators.window_skew import window_agg_skewed


@pytest.fixture(scope="module")
def skewed(spark):
    rows = []
    # hot key: 400 rows with repeated timestamps; cold keys: a few rows
    for i in range(400):
        rows.append((i, "hot", float(i % 7), 1_000_000 + (i // 3) * 250))
    for k in range(5):
        for i in range(4):
            rows.append((1000 + k * 10 + i, f"cold{k}", float(i), 1_000_000 + i * 500))
    return spark.createDataFrame(rows, "id long, k string, v double, ts long")


@pytest.mark.parametrize("buckets", [2, 4, 8])
def test_equals_plain_window(spark, skewed, buckets):
    wd = WindowDef(partition_by=["k"], order_by="ts", rows_range=1000)
    aggs = lambda: {
        "s": A.sum_("v"),
        "c": A.count_all(),
        "mx": A.max_("v"),
    }
    plain = {r["id"]: (r["s"], r["c"], r["mx"]) for r in window_agg(skewed, wd, aggs()).collect()}
    skw = {
        r["id"]: (r["s"], r["c"], r["mx"])
        for r in window_agg_skewed(skewed, wd, aggs(), buckets=buckets).collect()
    }
    assert plain == skw


def test_equals_with_maxsize_and_exclude(spark, skewed):
    # same-ts peers + MAXSIZE: which peers survive the cap depends on the
    # tie order, so pin it with a unique column (id)
    wd = WindowDef(
        partition_by=["k"], order_by="ts", rows_range=1500,
        maxsize=4, exclude_current_row=True, tiebreak="id",
    )
    plain = {r["id"]: (r["s"], r["c"]) for r in window_agg(
        skewed, wd, {"s": A.sum_("v"), "c": A.count_("v")}).collect()}
    skw = {r["id"]: (r["s"], r["c"]) for r in window_agg_skewed(
        skewed, wd, {"s": A.sum_("v"), "c": A.count_("v")}, buckets=4).collect()}
    assert plain == skw


def test_skew_split_preserves_end_bound(spark):
    from pyspark.sql import functions as F

    from openmldb_spark.functions import aggregates as A
    from openmldb_spark.operators.window import WindowDef, window_agg
    from openmldb_spark.operators.window_skew import window_agg_skewed

    rows = [("k", 1000 * i, float(i)) for i in range(1, 40)]
    df = spark.createDataFrame(rows, "pk string, ts long, v double")
    wd = WindowDef(partition_by=["pk"], order_by="ts", rows_range="10s", end_range="3s")
    plain = {r["ts"]: r["s"] for r in window_agg(df, wd, {"s": A.sum_("v")}).collect()}
    skewed = {r["ts"]: r["s"] for r in window_agg_skewed(df, wd, {"s": A.sum_("v")}, buckets=4).collect()}
    assert plain == skewed


@pytest.mark.parametrize("buckets", [2, 4, 8])
@pytest.mark.parametrize("n", [1, 5, 50])
def test_rows_frame_equals_plain_window(spark, skewed, buckets, n):
    """r13 (r12 verdict #4): plain ROWS (count) frames split exactly —
    replication bounds come from per-bucket row counts, as in the
    reference's count-frame skew opt (WindowAggPlan.scala:201-323).
    Same-ts peers exist in the hot key (every 3 rows share a ts), so the
    tie order is pinned with the unique id column."""
    wd = WindowDef(partition_by=["k"], order_by="ts", rows=n, tiebreak="id")
    aggs = lambda: {"s": A.sum_("v"), "c": A.count_all(), "mx": A.max_("v")}
    plain = {
        r["id"]: (r["s"], r["c"], r["mx"])
        for r in window_agg(skewed, wd, aggs()).collect()
    }
    skw = {
        r["id"]: (r["s"], r["c"], r["mx"])
        for r in window_agg_skewed(skewed, wd, aggs(), buckets=buckets).collect()
    }
    assert plain == skw


def test_rows_frame_with_end_rows_and_open_preceding(spark, skewed):
    """Bounded upper ends and OPEN lower bounds only narrow ROWS frames,
    so the count-based replication stays sufficient."""
    for kw in (dict(end_rows=2), dict(open_preceding=True)):
        wd = WindowDef(
            partition_by=["k"], order_by="ts", rows=6, tiebreak="id", **kw
        )
        plain = {
            r["id"]: (r["s"], r["c"])
            for r in window_agg(
                skewed, wd, {"s": A.sum_("v"), "c": A.count_("v")}
            ).collect()
        }
        skw = {
            r["id"]: (r["s"], r["c"])
            for r in window_agg_skewed(
                skewed, wd, {"s": A.sum_("v"), "c": A.count_("v")}, buckets=4
            ).collect()
        }
        assert plain == skw, kw


def test_rows_frame_exclude_current_time(spark, skewed):
    """EXCLUDE CURRENT_TIME over a ROWS frame widens the collected
    lookback by lookback_slack; the replication lookback widens with it."""
    wd = WindowDef(
        partition_by=["k"], order_by="ts", rows=5,
        exclude_current_time=True, tiebreak="id",
    )
    plain = {
        r["id"]: (r["s"], r["c"])
        for r in window_agg(
            skewed, wd, {"s": A.sum_("v"), "c": A.count_("v")}
        ).collect()
    }
    skw = {
        r["id"]: (r["s"], r["c"])
        for r in window_agg_skewed(
            skewed, wd, {"s": A.sum_("v"), "c": A.count_("v")}, buckets=4
        ).collect()
    }
    assert plain == skw
