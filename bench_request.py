"""Request-serving latency benchmark — the counterpart of the reference's
own headline benchmark (per-request deployed-procedure latency,
``benchmark/.../OpenMLDBPerfBenchmark.java:43-139``, knobs WINDOW_NUM /
WINDOW_SIZE / JOIN_NUM), which the batch-oriented ``bench.py`` does not
measure.

Deploys a two-window + LAST JOIN feature query over the driver's
``events`` (main) and ``customer`` (dim) tables, then drives N requests
through the serving path and publishes, per arm:

- ``p50/p95/p99``: SINGLE-ROW requests through
  ``SqlDeployment.run_request`` with a prebuilt one-row DataFrame — the
  r9-comparable arm. Since r10 this serves from the COMPILED request
  plan: the SQL is parsed + lowered + analyzed once per deployment, and
  each call swaps the staged rows — the analog of the reference
  compiling once per DEPLOY (``hybridse/src/vm/engine.cc:453-496``).
  What remains per call: the ``DataFrame.toArrow`` staging collect
  (~0.2s — the request is an RDD-backed DataFrame, so reading its one
  row is itself a Spark job), fresh physical planning over the cached
  analyzed plan (fresh shuffles are REQUIRED for fresh staged data;
  re-collecting one Dataset reuses its shuffle map outputs and would
  serve the previous rows), and the serve job itself.
- ``row_p50/row_p95/row_p99``: the same requests as DRIVER-SIDE ROWS via
  ``run_request_rows`` — the faithful CallProcedure shape
  (``src/sdk/sql_cluster_router.h:116-190`` binds one SQLRequestRow per
  call). Staging is a driver-local encode (no job), so this arm isolates
  plan+exec: the number a serving frontend (the RESTful server uses this
  path) actually pays. r11 restructured this arm's hot path: simple-typed
  schemas stage into a fixed-size text file read by a pure-JVM scan —
  zero Python stages per serve (each 1-row ``mapInArrow`` execution cost
  ~200 ms on this host, the dominant r10 term), history-only LAST JOIN
  dedupe sides persist at compile time (``engine/servingmat.py``, the
  tablet-resident-state analog), and the serve job runs under
  serving-tuned confs (AQE off + 2 shuffle partitions — serve shuffles
  carry request-row-sized data, so data-sized planning machinery only
  adds latency). Net: row_p50 681 -> ~370 ms. r12 moved those confs onto
  an ISOLATED ``newSession()`` clone (engine runtime confs copied, the
  two serving overrides set once; each serve re-roots the analyzed plan
  via ``Dataset.ofRows``) — same latency, and the engine session's confs
  are never touched, so concurrently planned batch queries keep AQE.
- ``local_p50/local_p95/local_p99`` (r13): the same requests as
  DRIVER-LOCAL DataFrames — ``createDataFrame(pyarrow.Table)``, the
  shape Spark Connect clients produce — through ``run_request``. The
  request plan collapses to a ``LocalRelation``, so staging is job-free
  (``CompiledRequestPlan._local_request_table``) and the serve runs the
  SAME job count as the rows arm; the target is local_p50 ≈ row_p50
  plus only the DataFrame-wrapping overhead.
- ``batch_amortized_ms``: one BATCH-row request through ``run_request``
  divided by the batch size — the Spark-native serving shape. The
  RDD-backed DataFrame arm pays one extra job the rows and local arms do
  not: evaluating the caller's request DataFrame (a 1-row
  ``createDataFrame`` from tuples is an RDD-backed plan spread over
  defaultParallelism Python-worker tasks, ~250-350 ms on this host — the
  caller's plan, not the serve path).

Honest framing: each request is still a full Spark local job; the
reference's tablet serves the same shape in single-digit ms from a
skiplist. The serving-path structural wins this engine ships are the
compiled plan (r10) and history key-pruning
(``_prune_history_to_request_keys``, r9) — at 100 TB the latter is the
difference between serving and a full scan per call. The tracked numbers
are the serving-cost trend and the batch amortization ratio, not a claim
to tablet-class point latency.

Output: ONE JSON line
``{"metric": "request_latency_ms", "p50": .., "p95": .., "p99": ..,
"row_p50": .., "row_p95": .., "row_p99": .., "n": N, "batch_rows": B,
"batch_amortized_ms": .., "sf": ..}``.

Env knobs: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.01),
SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_REQS (default 30),
SPARK_GRAFT_REQ_BATCH (default 200).
"""

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_reqs = int(os.environ.get("SPARK_GRAFT_REQS", "30"))
    batch_rows = int(os.environ.get("SPARK_GRAFT_REQ_BATCH", "200"))

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .appName("openmldb-spark-bench-request")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from openmldb_spark.engine import Engine
    from openmldb_spark.session import load_table

    eng = Engine(spark)
    events = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer")
    eng.register("events", events)
    eng.register("customer", customer)

    dep = eng.execute(
        "DEPLOY bench_req SELECT event_id, user_id, "
        "sum(value) OVER w1 AS sum_v, count(value) OVER w1 AS cnt_v, "
        "avg(value) OVER w2 AS avg_v, max(value) OVER w2 AS max_v, "
        "customer.c_acctbal AS acctbal, customer.c_mktsegment AS segment "
        "FROM events LAST JOIN customer ON events.user_id = customer.c_custkey "
        "WINDOW w1 AS (PARTITION BY user_id ORDER BY ts "
        "ROWS_RANGE BETWEEN 1d PRECEDING AND CURRENT ROW), "
        "w2 AS (PARTITION BY user_id ORDER BY ts "
        "ROWS BETWEEN 100 PRECEDING AND CURRENT ROW)"
    )

    # request rows: real events rows (schema-exact), pre-built OUTSIDE the
    # timed region — the reference times the procedure call with a ready
    # request row, not row construction
    sample = events.limit(max(n_reqs, batch_rows)).collect()
    schema = dep.input_schema
    single = [
        spark.createDataFrame([sample[i % len(sample)]], schema)
        for i in range(n_reqs)
    ]
    batch = spark.createDataFrame(
        [sample[i % len(sample)] for i in range(batch_rows)], schema
    )

    # warmup: plan-compile + JIT tiers out of the measurement
    for _ in range(3):
        dep.run_request(single[0]).collect()

    def pct(lat, p: float) -> float:
        i = min(len(lat) - 1, int(round(p / 100 * (len(lat) - 1))))
        return round(lat[i], 1)

    lat = []
    for req in single:
        t0 = time.perf_counter()
        rows = dep.run_request(req).collect()
        lat.append((time.perf_counter() - t0) * 1000.0)
        assert len(rows) == 1
        print(f"req {len(lat)}: {lat[-1]:.1f} ms", file=sys.stderr)
    lat.sort()

    row_lat = []
    for i in range(n_reqs):
        r = sample[i % len(sample)]
        t0 = time.perf_counter()
        rows = dep.run_request_rows([r])
        row_lat.append((time.perf_counter() - t0) * 1000.0)
        assert len(rows) == 1
        print(f"row req {len(row_lat)}: {row_lat[-1]:.1f} ms", file=sys.stderr)
    row_lat.sort()

    # driver-local (arrow-backed) request frames: LocalRelation plans,
    # job-free staging — the Spark Connect createDataFrame shape
    local_single = [
        spark.createDataFrame(df.toArrow(), schema) for df in single
    ]
    local_lat = []
    for req in local_single:
        t0 = time.perf_counter()
        rows = dep.run_request(req).collect()
        local_lat.append((time.perf_counter() - t0) * 1000.0)
        assert len(rows) == 1
        print(
            f"local req {len(local_lat)}: {local_lat[-1]:.1f} ms",
            file=sys.stderr,
        )
    local_lat.sort()

    t0 = time.perf_counter()
    got = dep.run_request(batch).collect()
    batch_ms = (time.perf_counter() - t0) * 1000.0
    assert len(got) == batch_rows

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "metric": "request_latency_ms",
        "p50": pct(lat, 50), "p95": pct(lat, 95), "p99": pct(lat, 99),
        "row_p50": pct(row_lat, 50), "row_p95": pct(row_lat, 95),
        "row_p99": pct(row_lat, 99),
        "local_p50": pct(local_lat, 50), "local_p95": pct(local_lat, 95),
        "local_p99": pct(local_lat, 99),
        "n": n_reqs,
        "batch_rows": batch_rows,
        "batch_amortized_ms": round(batch_ms / batch_rows, 2),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))


if __name__ == "__main__":
    main()
