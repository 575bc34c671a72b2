"""Streaming request mode (SURVEY §2.8): a file-source stream of request
rows evaluated per micro-batch against history — features must equal the
batch-mode values (train/serve consistency across the streaming boundary)."""

import time

import pytest
from pyspark.sql import functions as F

from openmldb_spark.engine import Engine
from openmldb_spark.streaming import request_mode_stream


def test_stream_matches_batch(spark, tmp_path):
    eng = Engine(spark)
    eng.execute("CREATE TABLE ev (pk string, ts bigint, v double)")
    rows = [("a", t * 1000, float(t)) for t in range(1, 7)] + [
        ("b", t * 1000, 2.0 * t) for t in range(1, 4)
    ]
    vals = ", ".join(f"('{p}', {t}, {v})" for p, t, v in rows)
    eng.execute(f"INSERT INTO ev VALUES {vals}")
    dep = eng.execute(
        "DEPLOY s1 SELECT pk, ts, sum(v) OVER w1 AS sv FROM ev WINDOW w1 AS "
        "(PARTITION BY pk ORDER BY ts ROWS_RANGE BETWEEN 2s PRECEDING AND CURRENT ROW)"
    )
    history = eng.tables["ev"]

    # request rows arrive as files (stand-in for a Kafka topic)
    req_dir = tmp_path / "requests"
    req_dir.mkdir()
    new_reqs = spark.createDataFrame(
        [("a", 7000, 7.0), ("b", 4000, 8.0)], "pk string, ts bigint, v double"
    )
    new_reqs.coalesce(1).write.parquet(str(req_dir / "batch0"))

    stream = (
        spark.readStream.schema("pk string, ts bigint, v double")
        .option("recursiveFileLookup", "true")
        .parquet(str(req_dir))
    )
    got: list = []
    q = request_mode_stream(
        stream,
        history,
        dep,
        sink=lambda df, bid: got.extend(df.collect()),
        checkpoint_dir=str(tmp_path / "ckpt"),
        trigger_seconds=1,
    )
    try:
        deadline = time.time() + 60
        while not got and time.time() < deadline:
            time.sleep(0.5)
    finally:
        q.stop()
    assert got, "stream produced no feature rows"
    feats = {(r["pk"], r["ts"]): r["sv"] for r in got}
    # expected = batch values over history+requests (requests not in history,
    # so frames = history rows in range + the request row)
    full = history.unionByName(new_reqs)
    expected = {
        ("a", 7000): 5.0 + 6.0 + 7.0,
        ("b", 4000): 2.0 * 2 + 2.0 * 3 + 8.0,
    }
    assert feats == expected


def test_ann_serving_stream_matches_batch(spark, tmp_path):
    """IVF top-k served over a query stream == the same ivf_topk call in
    batch (the foreachBatch loop runs the identical plan per micro-batch)."""
    import functools
    import math

    from openmldb_spark.pipeline.similarity import ivf_topk
    from openmldb_spark.streaming import ann_serving_stream

    corpus = spark.createDataFrame(
        [(i, [math.cos(i * 0.31), math.sin(i * 0.31), 0.1 * (i % 5)]) for i in range(40)],
        "vec_id long, v array<float>",
    )
    queries = spark.createDataFrame(
        [(100 + i, [math.cos(i * 0.31), math.sin(i * 0.31), 0.05]) for i in range(5)],
        "vec_id long, v array<float>",
    )
    topk = functools.partial(
        ivf_topk,
        corpus_id="vec_id", corpus_vec="v", query_id="vec_id", query_vec="v",
        k=3, n_centroids=8, nprobe=8, seed=7, exclude_self=False,
    )
    expected = {
        (r["query_id"], r["neighbor_id"]) for r in topk(corpus, queries).collect()
    }
    assert expected, "batch ivf_topk returned nothing"

    qdir = tmp_path / "queries"
    qdir.mkdir()
    queries.coalesce(1).write.parquet(str(qdir / "batch0"))
    stream = (
        spark.readStream.schema("vec_id long, v array<float>")
        .option("recursiveFileLookup", "true")
        .parquet(str(qdir))
    )
    got: list = []
    q = ann_serving_stream(
        stream,
        corpus,
        topk,
        sink=lambda df, bid: got.extend(df.collect()),
        checkpoint_dir=str(tmp_path / "ckpt_ann"),
        trigger_seconds=1,
    )
    try:
        deadline = time.time() + 60
        while not got and time.time() < deadline:
            time.sleep(0.5)
    finally:
        q.stop()
    assert {(r["query_id"], r["neighbor_id"]) for r in got} == expected


def test_long_window_serving_stream_matches_batch(spark, tmp_path):
    """Pre-agg maintenance on ingest: events stream in two ordered
    micro-batches, each batch's rows are served from the incrementally
    merged pre-agg + edge buckets — values must equal the batch sliding
    window over the full final history."""
    from pyspark.sql import Window

    from openmldb_spark.streaming import long_window_serving_stream

    B, R = 1000, 3500
    hist_rows = [("a", t, float(t % 7)) for t in range(1000, 9000, 700)] + [
        ("b", t, float(t % 5)) for t in range(1200, 9000, 1100)
    ]
    history = spark.createDataFrame(hist_rows, "uid string, ts long, v double")
    b1 = [("a", 9100, 1.0), ("b", 9200, 2.0), ("a", 9650, 3.0)]
    b2 = [("a", 10400, 4.0), ("b", 11050, 5.0)]

    ev_dir = tmp_path / "events"
    ev_dir.mkdir()
    spark.createDataFrame(b1, "uid string, ts long, v double").coalesce(1).write.parquet(
        str(ev_dir / "b1")
    )
    time.sleep(1.1)  # distinct mtimes: maxFilesPerTrigger picks oldest first
    spark.createDataFrame(b2, "uid string, ts long, v double").coalesce(1).write.parquet(
        str(ev_dir / "b2")
    )
    stream = (
        spark.readStream.schema("uid string, ts long, v double")
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(ev_dir))
    )
    got: list = []
    q = long_window_serving_stream(
        stream, history, ["uid"], "ts", "v", R, B, "sum",
        sink=lambda df, bid: got.extend(df.collect()),
        checkpoint_dir=str(tmp_path / "ckpt_lw"),
        trigger_seconds=1,
    )
    try:
        deadline = time.time() + 90
        while len(got) < len(b1) + len(b2) and time.time() < deadline:
            time.sleep(0.5)
    finally:
        q.stop()
    assert len(got) == len(b1) + len(b2)

    full = history.unionByName(
        spark.createDataFrame(b1 + b2, "uid string, ts long, v double")
    )
    w = (
        Window.partitionBy("uid")
        .orderBy("ts")
        .rangeBetween(-R, Window.currentRow)
    )
    want = {
        (r["uid"], r["ts"]): r["sv"]
        for r in full.withColumn("sv", F.sum("v").over(w)).collect()
    }
    for r in got:
        assert abs(r["agg_v"] - want[(r["uid"], r["ts"])]) < 1e-9, (
            r, want[(r["uid"], r["ts"])]
        )


@pytest.mark.slow
def test_long_window_serving_stream_bounded_state(spark, tmp_path):
    """r5 verdict item: >=20 micro-batches through the DURABLE state shape
    (bucket-partitioned parquet history + alternating pre-agg files) must
    stay correct with a STABLE cached-block count — no per-batch
    persisted-union chain."""
    from pyspark.sql import Window

    from openmldb_spark.streaming import long_window_serving_stream

    B, R = 1000, 3500
    history = spark.createDataFrame(
        [("a", t, float(t % 7)) for t in range(1000, 8000, 900)],
        "uid string, ts long, v double",
    )
    n_batches = 22
    batches = [[("a", 8000 + 500 * i, float(i))] for i in range(n_batches)]

    ev_dir = tmp_path / "events20"
    ev_dir.mkdir()
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, "uid string, ts long, v double").coalesce(
            1
        ).write.parquet(str(ev_dir / f"b{i:03d}"))
    stream = (
        spark.readStream.schema("uid string, ts long, v double")
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(ev_dir))
    )
    got: list = []
    rdd_counts: list = []
    jsc = spark.sparkContext._jsc.sc()

    def snk(df, bid):
        got.extend(df.collect())
        rdd_counts.append(jsc.getPersistentRDDs().size())

    q = long_window_serving_stream(
        stream, history, ["uid"], "ts", "v", R, B, "sum",
        sink=snk,
        checkpoint_dir=str(tmp_path / "ckpt_lw20"),
        trigger_seconds=1,
        state_dir=str(tmp_path / "lw_state"),
    )
    try:
        deadline = time.time() + 240
        while len(got) < n_batches and time.time() < deadline:
            time.sleep(0.5)
    finally:
        q.stop()
    assert len(got) == n_batches

    full = history.unionByName(
        spark.createDataFrame(
            [r for rows in batches for r in rows], "uid string, ts long, v double"
        )
    )
    w = Window.partitionBy("uid").orderBy("ts").rangeBetween(-R, Window.currentRow)
    want = {
        (r["uid"], r["ts"]): r["sv"]
        for r in full.withColumn("sv", F.sum("v").over(w)).collect()
    }
    for r in got:
        assert abs(r["agg_v"] - want[(r["uid"], r["ts"])]) < 1e-9
    # bounded state: cached-block count never trends upward (only the
    # current micro-batch is ever persisted)
    assert max(rdd_counts) - min(rdd_counts) <= 2, rdd_counts
