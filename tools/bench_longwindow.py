"""Long-window pre-agg speedup curve (reference shape:
``benchmark/.../OpenMLDBLongWindowBenchmark.java`` — pre-agg serving vs raw
per-request scans as WINDOW_SIZE grows).

For a fixed 2% request sample over the events table, serve
``sum(value) OVER (PARTITION BY event_type RANGE W PRECEDING)`` two ways
(event_type, not user_id: pre-agg pays off when many events share a
(key, bucket) — ~28 events per (type, hour) here, vs ~0.09 per (user,
hour) where buckets would be sparser than the rows themselves):

- raw:   per-request range join against raw history (work ~ O(rows in W))
- preagg: request_long_window — full 1h buckets from the maintained
  pre-agg + raw scans of the <=2 edge buckets (work ~ O(W/bucket) + O(2
  buckets)), the reference's RequestAggUnion plan

and print one JSON line with seconds AND aggregation-input rows (the
scale-relevant work metric: raw grows O(W), pre-agg O(W/bucket)) per
window size. Usage:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/bench_longwindow.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from openmldb_spark.plans.longwindow import preaggregate, request_long_window  # noqa: E402
from openmldb_spark.session import get_spark, load_table  # noqa: E402

HOUR = 3_600_000
WINDOWS = {"1h": HOUR, "6h": 6 * HOUR, "1d": 24 * HOUR, "7d": 168 * HOUR, "30d": 720 * HOUR}


def main() -> None:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bench_longwindow", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    e = load_table(spark, sf, "events").withColumn(
        "ts_ms", (F.col("ts").cast("timestamp").cast("double") * 1000).cast("long")
    )
    hist = e.select("event_type", "ts_ms", "value").persist()
    hist.count()
    reqs = (
        e.where(F.col("event_id") % 50 == 0)
        .select("event_id", "event_type", "ts_ms")
        .persist()
    )
    n_req = reqs.count()
    pre = preaggregate(hist, ["event_type"], "ts_ms", "value", HOUR).persist()
    n_buckets = pre.count()

    def timed(fn):
        best = None
        for _ in range(2):
            t0 = time.monotonic()
            fn()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 3)

    out = {"n_requests": n_req, "n_preagg_buckets": n_buckets, "curve": {}}
    for label, w in WINDOWS.items():
        r = reqs.alias("r")
        h = hist.alias("h")
        raw = (
            r.join(
                h,
                (F.col("r.event_type") == F.col("h.event_type"))
                & (F.col("h.ts_ms") >= F.col("r.ts_ms") - w)
                & (F.col("h.ts_ms") <= F.col("r.ts_ms")),
                "left",
            )
            .groupBy("r.event_id")
            .agg(F.sum("h.value").alias("sv"))
        )
        t_raw = timed(lambda: raw.count())
        lw = request_long_window(
            reqs, hist, pre, ["event_type"], "ts_ms", "value",
            range_ms=w, bucket_ms=HOUR, agg="sum", request_id="event_id",
        )
        t_pre = timed(lambda: lw.count())
        # work metric: rows feeding each path's final aggregation
        raw_pairs = r.join(
            h,
            (F.col("r.event_type") == F.col("h.event_type"))
            & (F.col("h.ts_ms") >= F.col("r.ts_ms") - w)
            & (F.col("h.ts_ms") <= F.col("r.ts_ms")),
        ).count()
        p2 = pre.alias("p")
        full_pairs = r.join(
            p2,
            (F.col("r.event_type") == F.col("p.event_type"))
            & (F.col("p.bucket") > ((F.col("r.ts_ms") - w) / HOUR).cast("long"))
            & (F.col("p.bucket") < (F.col("r.ts_ms") / HOUR).cast("long")),
        ).count()
        edge_pairs = r.join(
            h,
            (F.col("r.event_type") == F.col("h.event_type"))
            & (
                ((F.col("h.ts_ms") / HOUR).cast("long")
                 == ((F.col("r.ts_ms") - w) / HOUR).cast("long"))
                | ((F.col("h.ts_ms") / HOUR).cast("long")
                   == (F.col("r.ts_ms") / HOUR).cast("long"))
            )
            & (F.col("h.ts_ms") >= F.col("r.ts_ms") - w)
            & (F.col("h.ts_ms") <= F.col("r.ts_ms")),
        ).count()
        # spot-check equality on this window size
        j = raw.withColumnRenamed("sv", "want").join(lw, "event_id")
        bad = j.where(
            ~(F.col("agg_v").eqNullSafe(F.col("want"))
              | (F.abs(F.col("agg_v") - F.col("want")) < 1e-6))
        ).count()
        out["curve"][label] = {
            "raw_sec": t_raw,
            "preagg_sec": t_pre,
            "speedup": round(t_raw / t_pre, 2) if t_pre else None,
            "raw_rows": raw_pairs,
            "preagg_rows": full_pairs + edge_pairs,
            "work_ratio": round(raw_pairs / (full_pairs + edge_pairs), 1)
            if full_pairs + edge_pairs else None,
            "mismatches": bad,
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
