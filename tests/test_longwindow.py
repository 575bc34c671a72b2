"""Long-window pre-agg (SURVEY §4.3): bucket-combine + edge-scan must equal
the brute-force sliding window exactly."""

import pytest
from pyspark.sql import Window, functions as F

from openmldb_spark.plans.longwindow import preaggregate, request_long_window

B = 1000  # bucket_ms
R = 3500  # range_ms (covers 3.5 buckets -> always 2 partial edges + fulls)


@pytest.fixture(scope="module")
def hist(spark):
    rows = []
    # two keys, irregular ts incl. bucket-boundary and duplicate ts values
    for uid, base in (("a", 0), ("b", 50)):
        for i, off in enumerate([0, 120, 990, 1000, 1001, 2500, 3000, 4999, 5000, 7300, 9999]):
            rows.append((uid, base + off + 100000, float(i + 1)))
    return spark.createDataFrame(rows, "uid string, ts long, v double")


def brute(spark, hist, requests, agg):
    # oracle: per request row, aggregate raw history in [t-R, t]
    r = requests.alias("r")
    h = hist.alias("h")
    fn = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max, "avg": F.avg}[agg]
    return (
        r.join(
            h,
            (F.col("r.uid") == F.col("h.uid"))
            & (F.col("h.ts") >= F.col("r.ts") - R)
            & (F.col("h.ts") <= F.col("r.ts")),
            "left",
        )
        .groupBy("r.rid")
        .agg(fn(F.col("h.v")).alias("want"))
    )


@pytest.mark.parametrize("agg", ["sum", "count", "min", "max", "avg"])
def test_matches_bruteforce(spark, hist, agg):
    # request rows at history points AND at arbitrary off-row timestamps
    reqs = hist.select("uid", "ts").union(
        spark.createDataFrame(
            [("a", 100999), ("a", 104000), ("b", 100049), ("b", 111111)],
            "uid string, ts long",
        )
    ).withColumn("rid", F.monotonically_increasing_id())
    pre = preaggregate(hist, ["uid"], "ts", "v", B)
    got = request_long_window(
        reqs, hist, pre, ["uid"], "ts", "v", R, B, agg, request_id="rid"
    )
    want = brute(spark, hist, reqs, agg)
    j = got.join(want, "rid")
    bad = j.where(
        ~(
            F.col("agg_v").eqNullSafe(F.col("want"))
            | (F.abs(F.col("agg_v") - F.col("want")) < 1e-9)
        )
    )
    assert bad.count() == 0, bad.collect()


def test_preagg_incremental_merge(spark, hist):
    from openmldb_spark.plans.longwindow import preagg_merge

    old_part = hist.where(F.col("ts") < 105000)
    new_part = hist.where(F.col("ts") >= 105000)
    merged = preagg_merge(
        preaggregate(old_part, ["uid"], "ts", "v", B),
        preaggregate(new_part, ["uid"], "ts", "v", B),
        ["uid"],
    )
    full = preaggregate(hist, ["uid"], "ts", "v", B)
    key = lambda r: (r["uid"], r["bucket"])
    m = {key(r): (r["sum_v"], r["cnt_v"], r["min_v"], r["max_v"]) for r in merged.collect()}
    f = {key(r): (r["sum_v"], r["cnt_v"], r["min_v"], r["max_v"]) for r in full.collect()}
    assert m == f


def test_preagg_is_smaller_and_complete(spark, hist):
    pre = preaggregate(hist, ["uid"], "ts", "v", B)
    assert pre.count() < hist.count()
    # bucket totals reconstruct the global sum
    assert (
        pre.agg(F.sum("sum_v")).collect()[0][0]
        == hist.agg(F.sum("v")).collect()[0][0]
    )


def test_bucket_partitioned_history_prunes_partitions(spark, tmp_path):
    """The recommended storage layout (parquet partitioned by bucket):
    edge-bucket reads must turn into real partition pruning on the scan."""
    from pyspark.sql import functions as F

    from openmldb_spark.plans.longwindow import preaggregate, request_long_window

    rows = [("k%d" % (i % 3), 1000 * i, float(i)) for i in range(1, 300)]
    hist = spark.createDataFrame(rows, "pk string, ts long, v double")
    d = str(tmp_path / "hist_bucketed")
    (hist.withColumn("bucket", (F.col("ts") / 10000).cast("long"))
         .write.partitionBy("bucket").mode("overwrite").parquet(d))
    stored = spark.read.parquet(d)

    pre = preaggregate(stored, ["pk"], "ts", "v", 10000)
    reqs = spark.createDataFrame([("k1", 250000, 1.0)], "pk string, ts long, v double")
    out = request_long_window(reqs, stored, pre, ["pk"], "ts", "v", 50000, 10000, "sum")

    # correctness: history-only sum over [t-range, t] (the caller folds the
    # request row itself, as in the engine's serving path)
    want = sum(v for pk, ts, v in rows if pk == "k1" and 200000 <= ts <= 250000)
    got = out.collect()[0]["agg_v"]
    assert got == want

    # the history scan carries a PartitionFilters bucket IN (...) predicate
    plan = out._jdf.queryExecution().executedPlan().toString()
    pruned = [
        l for l in plan.splitlines()
        if "PartitionFilters" in l and "bucket" in l and " IN " in l
    ]
    assert pruned, "expected a static bucket IN partition filter on the history scan"
