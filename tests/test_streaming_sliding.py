"""Stateful streaming sliding windows must equal the batch window engine
for in-order arrivals (train/serve consistency across the streaming
boundary, state carried between micro-batches)."""

import time

import pytest
from pyspark.sql import functions as F

from openmldb_spark.functions import aggregates as A
from openmldb_spark.operators.window import WindowDef, window_agg
from openmldb_spark.streaming.sliding import stream_window_agg

RANGE_MS = 2500


@pytest.mark.slow
def test_stream_sliding_matches_batch(spark, tmp_path):
    rows_b0 = [("a", 1000, 1.0), ("a", 2000, 2.0), ("b", 1000, 5.0)]
    rows_b1 = [("a", 3000, 3.0), ("a", 6000, 4.0), ("b", 2000, None)]
    schema = "k string, ts long, v double"

    src = tmp_path / "stream"
    src.mkdir()
    spark.createDataFrame(rows_b0, schema).coalesce(1).write.parquet(str(src / "b0"))

    stream = (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    feats = stream_window_agg(stream, "k", "ts", "v", RANGE_MS)
    q = (
        feats.writeStream.format("memory")
        .queryName("sliding_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # second micro-batch arrives later — state must carry over
        spark.createDataFrame(rows_b1, schema).coalesce(1).write.parquet(str(src / "b1"))
        deadline = time.time() + 60
        while time.time() < deadline:
            q.processAllAvailable()
            n = spark.sql("SELECT count(*) FROM sliding_out").collect()[0][0]
            if n >= 6:
                break
            time.sleep(0.5)
    finally:
        q.stop()

    got = {
        (r["key"], r["ts"]): (r["w_sum"], r["w_cnt"], r["w_min"], r["w_max"])
        for r in spark.sql("SELECT * FROM sliding_out").collect()
    }

    # batch reference over the full data
    full = spark.createDataFrame(rows_b0 + rows_b1, schema)
    wd = WindowDef(partition_by=["k"], order_by="ts", rows_range=RANGE_MS)
    ref = window_agg(
        full,
        wd,
        {"s": A.sum_("v"), "c": A.count_("v"), "mn": A.min_("v"), "mx": A.max_("v")},
    )
    want = {
        (r["k"], r["ts"]): (r["s"], r["c"], r["mn"], r["mx"]) for r in ref.collect()
    }
    assert got == want


def test_stream_sliding_end_bound_matches_batch(spark, tmp_path):
    """end_ms (bounded upper frame end) must equal the batch engine's
    end_range on the same data."""
    rows = [("a", 1000, 1.0), ("a", 2000, 2.0), ("a", 3000, 3.0),
            ("a", 4500, 4.0), ("b", 1000, 5.0), ("b", 3000, 6.0)]
    schema = "k string, ts long, v double"
    src = tmp_path / "stream2"
    src.mkdir()
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(src / "b0"))
    stream = (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    feats = stream_window_agg(stream, "k", "ts", "v", 3000, end_ms=1000)
    q = (
        feats.writeStream.format("memory")
        .queryName("sliding_end_out")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["key"], r["ts"]): (r["w_sum"], r["w_cnt"])
        for r in spark.sql("SELECT * FROM sliding_end_out").collect()
    }
    full = spark.createDataFrame(rows, schema)
    wd = WindowDef(partition_by=["k"], order_by="ts", rows_range=3000, end_range=1000)
    ref = window_agg(full, wd, {"s": A.sum_("v"), "c": A.count_("v")})
    want = {(r["k"], r["ts"]): (r["s"], r["c"]) for r in ref.collect()}
    assert got == want
