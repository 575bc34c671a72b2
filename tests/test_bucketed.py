"""Bucketed tables: equi-joins on the bucket key must not shuffle either
side (co-located join — the batch analogue of the reference's index)."""

import pytest
from pyspark.sql import functions as F

from openmldb_spark.catalog import IndexDef, save_bucketed


def _plan(df) -> str:
    jdf = df._jdf
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return jdf.queryExecution().explainString(mode)


def test_bucketed_join_has_no_exchange(spark):
    left = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(0, 500).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("b")
    )
    idx = IndexDef("i", keys=["k"])
    save_bucketed(left, "bk_left", idx, buckets=8)
    save_bucketed(right, "bk_right", idx, buckets=8)
    try:
        # disable auto-broadcast so the join would otherwise shuffle
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("bk_left").join(spark.table("bk_right"), "k")
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        assert joined.count() == 500
        # aggregation on the bucket key: also exchange-free
        agg = spark.table("bk_left").groupBy("k").agg(F.sum("a"))
        assert "Exchange" not in _plan(agg)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bk_left")
        spark.sql("DROP TABLE IF EXISTS bk_right")
