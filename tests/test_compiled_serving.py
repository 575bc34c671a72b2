"""The compiled request plan (engine/serving.py CompiledRequestPlan) —
the r10 headline: the reference compiles a deployment's plan once per
DEPLOY and binds rows per call (hybridse/src/vm/engine.cc:453-496,
src/sdk/sql_cluster_router.h:116-190 CallProcedure); here the SQL is
parsed + lowered + analyzed once against a staged Arrow request source
and each serve swaps the staged rows."""

import os

import pytest
from pyspark.sql import functions as F

from openmldb_spark.engine import Engine
from openmldb_spark.sql.lowering import Lowerer


DDL = (
    "CREATE TABLE t0 (id int, c1 string, c4 bigint, c7 timestamp,"
    " INDEX(KEY=(c1), TS=c7))"
)
ROWS = [
    (1, "aa", 30, 1590738991000),
    (2, "aa", 31, 1590738992000),
    (3, "bb", 50, 1590738993000),
]
SQL = (
    "SELECT id, c1, sum(c4) OVER w1 as s FROM t0 WINDOW w1 AS "
    "(PARTITION BY t0.c1 ORDER BY t0.c7 ROWS_RANGE BETWEEN 10s "
    "PRECEDING AND CURRENT ROW)"
)


def _engine(spark):
    eng = Engine(spark)
    eng.execute(DDL)
    vals = ", ".join("(%d, %r, %d, %d)" % r for r in ROWS)
    eng.execute(f"INSERT INTO t0 VALUES {vals}")
    return eng


def _ts(ms):
    import datetime

    return datetime.datetime.utcfromtimestamp(ms / 1000)


def _conv(rows):
    return [(i, c, v, _ts(ms)) for i, c, v, ms in rows]


def _req(spark, dep, rows):
    return spark.createDataFrame(_conv(rows), dep.input_schema)


def test_lowering_runs_once_across_requests(spark, monkeypatch):
    """The compile-once pin: N run_request calls -> ONE Lowerer.query
    (the compile), not N."""
    eng = _engine(spark)
    dep = eng.execute(f"DEPLOY dc1 {SQL}")

    calls = []
    orig = Lowerer.query

    def counting(self, q, params):
        calls.append(1)
        return orig(self, q, params)

    monkeypatch.setattr(Lowerer, "query", counting)
    for i in range(3):
        got = dep.run_request(
            _req(spark, dep, [(9, "aa", 40, 1590738995000 + i)])
        ).collect()
        assert got[0]["s"] == 30 + 31 + 40
    assert sum(calls) == 1, f"lowering ran {sum(calls)} times for 3 requests"


def test_compiled_matches_uncached_path(spark):
    """Same requests through the compiled plan and the per-call build
    must agree row for row (including a fresh second request — re-serving
    must NOT reuse the first request's shuffle outputs)."""
    eng = _engine(spark)
    dep = eng.execute(f"DEPLOY dc2 {SQL}")
    reqs = [
        [(9, "aa", 40, 1590738995000)],
        [(10, "bb", 7, 1590738995000), (11, "aa", 1, 1590738996000)],
    ]
    for rows in reqs:
        compiled = sorted(map(tuple, dep.run_request(_req(spark, dep, rows)).collect()))
        dep.use_compiled = False
        plain = sorted(map(tuple, dep.run_request(_req(spark, dep, rows)).collect()))
        dep.use_compiled = True
        assert compiled == plain, rows
    # second request's values are its own, not the first's (stale-shuffle
    # hazard the fresh-Dataset-per-serve design exists to avoid)
    got = {r["id"]: r["s"] for r in dep.run_request(_req(spark, dep, reqs[1])).collect()}
    assert got == {10: 50 + 7, 11: 30 + 31 + 1}


def test_dml_invalidates_compiled_plan(spark):
    eng = _engine(spark)
    dep = eng.execute(f"DEPLOY dc3 {SQL}")
    req = _req(spark, dep, [(9, "aa", 40, 1590738995000)])
    assert dep.run_request(req).collect()[0]["s"] == 30 + 31 + 40
    first = dep._compiled
    assert first is not None
    eng.execute(
        "INSERT INTO t0 VALUES (4, 'aa', 100, 1590738994000)"
    )
    assert dep.run_request(req).collect()[0]["s"] == 30 + 31 + 100 + 40
    assert dep._compiled is not first, "epoch bump did not recompile"


def test_explicit_history_and_parameters_bypass_compiled(spark):
    eng = _engine(spark)
    dep = eng.execute(f"DEPLOY dc4 {SQL}")
    req = _req(spark, dep, [(9, "aa", 40, 1590738995000)])
    hist = eng.tables["t0"].where("id = 1")
    got = dep.run_request(req, history=hist).collect()
    assert got[0]["s"] == 30 + 40
    assert dep._compiled is None, "explicit history must not compile/stage"
    # parameterized deploys bind per call: also uncached
    dep2 = eng.execute(f"DEPLOY dc4p SELECT id, c1 FROM t0 WHERE id > ?")
    got2 = dep2.run_request(req, parameters=[2]).collect()
    assert {r["id"] for r in got2} == {9}
    assert dep2._compiled is None


def test_run_request_rows_matches_dataframe_path(spark):
    eng = _engine(spark)
    dep = eng.execute(f"DEPLOY dc5 {SQL}")
    rows = [(9, "aa", 40, 1590738995000), (10, "bb", 7, 1590738995000)]
    via_rows = sorted(map(tuple, dep.run_request_rows(_conv(rows))))
    via_df = sorted(map(tuple, dep.run_request(_req(spark, dep, rows)).collect()))
    assert via_rows == via_df
    assert dep.run_request_rows([]) == []


def test_drop_releases_staged_dir(spark):
    eng = _engine(spark)
    dep = eng.execute(f"DEPLOY dc6 {SQL}")
    dep.run_request(_req(spark, dep, [(9, "aa", 40, 1590738995000)])).collect()
    staged_dir = dep._compiled._dir
    assert os.path.isdir(staged_dir)
    eng.execute("DROP DEPLOYMENT dc6")
    assert not os.path.exists(staged_dir), "DROP leaked the staged request dir"


def test_ttl_pin_change_recompiles(spark):
    """SET @@ttl_now_ms reshapes serving history -> the compiled plan
    must rebuild (same machinery as the pre-agg cache key)."""
    eng = Engine(spark)
    eng.execute(
        "CREATE TABLE t0 (id int, c1 string, c4 bigint, c7 timestamp,"
        " INDEX(KEY=(c1), TS=c7, TTL=2s, TTL_TYPE=absolute))"
    )
    eng.execute(
        "INSERT INTO t0 VALUES (1, 'aa', 30, 1590738991000),"
        " (2, 'aa', 31, 1590738995000)"
    )
    dep = eng.execute(f"DEPLOY dc7 {SQL}")
    req = _req(spark, dep, [(9, "aa", 40, 1590738996000)])
    # default pin: max(ts)=...995000, TTL 2s -> only row 2 lives
    assert dep.run_request(req).collect()[0]["s"] == 31 + 40
    eng.execute("SET @@ttl_now_ms = 1590738992500")
    try:
        # pinned "now": row 1 (991000 > 992500-2000) lives, row 2 future
        # rows always live (ts > now - ttl)
        got = dep.run_request(req).collect()[0]["s"]
        assert got == 30 + 31 + 40
    finally:
        eng.variables.pop("ttl_now_ms", None)


@pytest.mark.slow
def test_concurrent_serve_rows_no_cross_talk(spark):
    """The RESTful server is a ThreadingHTTPServer: concurrent requests to
    one deployment must each get THEIR OWN result (the staged file is a
    shared slot — serve_rows serializes stage+collect under the plan
    lock, otherwise thread B's staging overwrites thread A's rows before
    A collects)."""
    import concurrent.futures

    eng = _engine(spark)
    dep = eng.execute(f"DEPLOY dc8 {SQL}")
    dep.run_request_rows(_conv([(0, "aa", 0, 1590738995000)]))  # compile

    def call(i):
        key = "aa" if i % 2 == 0 else "bb"
        rows = dep.run_request_rows(_conv([(100 + i, key, i, 1590738995000)]))
        assert len(rows) == 1
        return rows[0]["id"], rows[0]["s"], key, i

    with concurrent.futures.ThreadPoolExecutor(max_workers=8) as ex:
        results = list(ex.map(call, range(16)))
    for rid, s, key, i in results:
        hist = 30 + 31 if key == "aa" else 50
        assert rid == 100 + i and s == hist + i, (rid, s, key, i)


def test_parameterized_body_never_compiles_and_errors_cleanly(spark):
    """A deployed body that still holds `?` placeholders (r10 regression,
    caught by the advice-r8 RESTful family): every serving surface must
    take the per-call path — the compiled plan would freeze one binding —
    and serving WITHOUT parameters fails with the dialect contract error,
    not Spark's mid-analysis UNBOUND_SQL_PARAMETER."""
    import json

    from openmldb_spark.restful import ApiServer

    eng = _engine(spark)
    dep = eng.execute("DEPLOY dcp1 SELECT id, c1 FROM t0 WHERE id > ?")
    assert dep.has_params is True
    req = _req(spark, dep, [(9, "aa", 40, 1590738995000)])
    # bound parameters: per-call build, works, never caches a plan
    assert {r["id"] for r in dep.run_request(req, parameters=[2]).collect()} == {9}
    assert dep._compiled is None
    # unbound: the contract error on every surface
    with pytest.raises(ValueError, match="parameterized"):
        dep.run_request(req)
    with pytest.raises(ValueError, match="parameterized"):
        dep.run_batch()
    with pytest.raises(ValueError, match="parameterized"):
        dep.run_request_rows(_conv([(9, "aa", 40, 1590738995000)]))
    assert dep._compiled is None
    # RESTful exec surfaces it as a clean API error payload
    api = ApiServer(eng)
    r = api.handle(
        "POST",
        f"/dbs/{eng.current_db}/deployments/dcp1",
        json.dumps({"input": [[9, "aa", 40, 1590738995000]]}),
    )
    assert r["code"] != 0 and "parameterized" in r["msg"]


def test_custom_staging_dir_round_trips_a_serve(spark, tmp_path):
    """Engine(staging_dir=...) relocates the staged Arrow file (the
    cluster contract: a shared-filesystem path every executor can read)
    and serving still answers correctly through it."""
    root = str(tmp_path / "shared_staging")
    eng = Engine(spark, staging_dir=root)
    eng.execute(DDL)
    vals = ", ".join("(%d, %r, %d, %d)" % r for r in ROWS)
    eng.execute(f"INSERT INTO t0 VALUES {vals}")
    dep = eng.execute(f"DEPLOY dc9 {SQL}")
    got = dep.run_request_rows(_conv([(9, "aa", 40, 1590738995000)]))
    assert got[0]["s"] == 30 + 31 + 40
    staged_dir = dep._compiled._dir
    assert staged_dir.startswith(root), staged_dir
    eng.execute("DROP DEPLOYMENT dc9")
    assert not os.path.exists(staged_dir)
    assert os.path.isdir(root), "DROP must release the serve dir, not the root"


def test_staging_conf_key_is_honored(spark, tmp_path):
    from openmldb_spark.engine.compiled import STAGING_DIR_CONF

    root = str(tmp_path / "conf_staging")
    spark.conf.set(STAGING_DIR_CONF, root)
    try:
        eng = _engine(spark)
        dep = eng.execute(f"DEPLOY dc10 {SQL}")
        dep.run_request_rows(_conv([(9, "bb", 1, 1590738995000)]))
        assert dep._compiled._dir.startswith(root)
    finally:
        spark.conf.unset(STAGING_DIR_CONF)


def test_staging_dir_required_on_nonlocal_master():
    """The 100x-deployment guard: a non-local master with no explicit
    staging dir must refuse loudly, not serve empty results."""
    from openmldb_spark.engine.compiled import resolve_staging_dir

    assert resolve_staging_dir("local[32]", None) is None
    assert resolve_staging_dir("local", None) is None
    assert resolve_staging_dir("yarn", "/mnt/nfs/stage") == "/mnt/nfs/stage"
    with pytest.raises(RuntimeError, match="stagingDir"):
        resolve_staging_dir("yarn", None)
    with pytest.raises(RuntimeError, match="shared-filesystem"):
        resolve_staging_dir("spark://host:7077", None)


def test_jvm_staging_round_trips_every_simple_type(spark):
    """The JVM text staging (base64 cells + Catalyst casts) must agree
    with the uncompiled path bit-for-bit across the full simple-type
    surface, including nulls, empty strings, separator characters inside
    strings, non-finite doubles, binary, and sub-second timestamps."""
    eng = Engine(spark)
    eng.execute(
        "CREATE TABLE tt (id int, b bool, s16 smallint, i64 bigint,"
        " f float, d double, s string, bin string, dt date, c7 timestamp,"
        " INDEX(KEY=(id), TS=c7))"
    )
    eng.execute(
        "INSERT INTO tt VALUES (1, true, 3, 40, 1.5, 2.5, 'x', 'y',"
        " '2024-01-02', 1590738991000)"
    )
    sql = (
        "SELECT id, b, s16, i64, f, d, s, bin, dt,"
        " count(i64) OVER w1 as c FROM tt WINDOW w1 AS"
        " (PARTITION BY id ORDER BY c7 ROWS BETWEEN 10 PRECEDING AND"
        " CURRENT ROW)"
    )
    dep = eng.execute(f"DEPLOY tjvm {sql}")
    assert dep._compiled is None
    import datetime

    ts = datetime.datetime(2020, 5, 29, 8, 1, 2, 345678)
    rows = [
        (2, False, -7, 9_007_199_254_740_993, float("nan"), float("inf"),
         "comma, \n tilde~ ünïcode", "", datetime.date(1999, 12, 31), ts),
        (3, None, None, None, None, float("-inf"), None, "~", None, ts),
        (4, True, 0, 0, -0.0, 1.7976931348623157e308, "~", "a,b", None, ts),
    ]
    got = dep.run_request_rows(rows)
    assert dep._compiled is not None and dep._compiled._jvm_mode
    want = dep._run_request_on(
        dep._query_with_params(None),
        spark.createDataFrame(rows, dep.input_schema),
        None,
    ).collect()

    def key(r):
        return tuple(str(v) for v in r)

    assert sorted(map(key, got)) == sorted(map(key, want))


def test_jvm_staging_rejects_oversized_batch(spark):
    from openmldb_spark.engine.compiled import STAGING_BYTES_CONF

    spark.conf.set(STAGING_BYTES_CONF, "256")
    try:
        eng = _engine(spark)
        dep = eng.execute(f"DEPLOY tjvm2 {SQL}")
        big = [(i, "x" * 50, i, 1590738995000 + i) for i in range(64)]
        with pytest.raises(Exception, match="stagingBytes"):
            dep.run_request_rows(_conv(big))
        # a fitting batch on the same compiled plan still serves
        assert len(dep.run_request_rows(_conv([(9, "aa", 1, 1590738995000)]))) == 1
    finally:
        spark.conf.unset(STAGING_BYTES_CONF)


def test_serving_session_isolated_from_batch_confs(spark):
    """Serves run on a newSession clone with the serving confs set ONCE;
    the engine session's AQE/shuffle confs are never touched — not even
    transiently (there is no swap to race with), so a batch query planned
    DURING an in-flight serve still plans with AQE on."""
    import threading

    from openmldb_spark.engine.compiled import FAST_CONFS_CONF

    eng = _engine(spark)
    dep = eng.execute(f"DEPLOY tjvm3 {SQL}")
    dep.run_request_rows(_conv([(9, "aa", 40, 1590738995000)]))
    cp = dep._compiled
    assert cp is not None and cp._serve_spark is not None
    assert cp._serve_spark.conf.get("spark.sql.adaptive.enabled") == "false"
    assert cp._serve_spark.conf.get("spark.sql.shuffle.partitions") == "1"
    # the serve's own physical plan is non-AQE and clone-rooted...
    sdf = cp._fresh_serve_df()
    assert sdf.sparkSession is cp._serve_spark
    plan = sdf._jdf.queryExecution().executedPlan().toString()
    assert "AdaptiveSparkPlan" not in plan
    # ...while batch queries planned concurrently with serves keep AQE:
    # hammer explains on the engine session during in-flight serves
    aqe_seen = []
    stop = threading.Event()

    def batch_explains():
        while not stop.is_set():
            p = (
                spark.range(100)
                .groupBy((F.col("id") % 3).alias("k"))
                .count()
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
            aqe_seen.append("AdaptiveSparkPlan" in p)

    t = threading.Thread(target=batch_explains)
    t.start()
    try:
        for i in range(3):
            dep.run_request_rows(_conv([(9, "aa", 40, 1590738995000 + i)]))
    finally:
        stop.set()
        t.join()
    assert aqe_seen and all(aqe_seen), f"{aqe_seen.count(False)} AQE-off plans"
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    # serve-time opt-out: back to the engine session with its own confs
    spark.conf.set(FAST_CONFS_CONF, "false")
    try:
        assert cp._fresh_serve_df().sparkSession is spark
        assert len(dep.run_request_rows(_conv([(9, "bb", 1, 1590738995000)]))) == 1
    finally:
        spark.conf.unset(FAST_CONFS_CONF)


def test_nested_request_schema_falls_back_to_arrow_staging(spark):
    import datetime

    eng = Engine(spark)
    eng.register(
        "ta",
        spark.createDataFrame(
            [(1, ["a", "b"], datetime.datetime(2020, 5, 29, 8, 0, 0))],
            "id int, tags array<string>, c7 timestamp",
        ),
    )
    dep = eng.execute(
        "DEPLOY tarr SELECT id, tags, count(id) OVER w1 AS c FROM ta"
        " WINDOW w1 AS (PARTITION BY id ORDER BY c7 ROWS BETWEEN"
        " 10 PRECEDING AND CURRENT ROW)"
    )
    import datetime

    got = dep.run_request_rows(
        [(1, ["x", "y"], datetime.datetime(2020, 5, 29, 9, 0, 0))]
    )
    assert dep._compiled is not None and not dep._compiled._jvm_mode
    assert got[0]["tags"] == ["x", "y"] and got[0]["c"] == 2


def test_offer_refuses_staged_source_in_both_modes(spark):
    """servingmat.offer must decline any subtree reading the staged
    request source regardless of staging mode. The JVM text mode has no
    MapInArrow node, so refusal keys on the STAGED_MARKER tag — which
    must survive analysis (where offer looks) and constant-fold away
    before execution (zero serve cost)."""
    from openmldb_spark.engine import servingmat

    src = servingmat.mark_staged(spark.range(3).toDF("x"))
    analyzed = src._jdf.queryExecution().analyzed().toString()
    assert servingmat.STAGED_MARKER in analyzed
    optimized = src._jdf.queryExecution().optimizedPlan().toString()
    assert servingmat.STAGED_MARKER not in optimized  # folded away

    sink = []
    with servingmat.collecting(sink):
        # the marker survives through derived subtrees (the shape offer
        # actually sees: an aggregate over a join touching the source)
        derived = src.groupBy("x").count()
        out = servingmat.offer(derived)
        assert out is derived and sink == []
        # a genuinely history-only subtree is still accepted
        plain = spark.range(3).toDF("x").distinct()
        kept = servingmat.offer(plain)
        assert sink == [kept]
    kept.unpersist()


def test_self_last_join_on_request_table_jvm_mode(spark):
    """The ADVICE r11 scenario: a deployment whose LAST JOIN right side
    IS the request table. In JVM staging mode the right side reads the
    staged text source (no MapInArrow); offering it would persist the
    compile-time EMPTY staged file and every serve would join against
    nothing. The marker must keep it un-materialized and the compiled
    result equal to the uncompiled path."""
    eng = _engine(spark)
    dep = eng.execute(
        "DEPLOY dself SELECT t0.id, t0.c1, r.c4 as rc4 FROM t0 "
        "LAST JOIN t0 AS r ORDER BY r.c7 ON t0.c1 = r.c1"
    )
    rows = [(9, "aa", 40, 1590738995000), (10, "bb", 7, 1590738996000)]
    compiled = sorted(
        map(tuple, dep.run_request(_req(spark, dep, rows)).collect())
    )
    assert dep._compiled is not None and dep._compiled._jvm_mode
    # nothing offered over the request source was materialized
    assert dep._compiled._materialized == []
    dep.use_compiled = False
    plain = sorted(
        map(tuple, dep.run_request(_req(spark, dep, rows)).collect())
    )
    dep.use_compiled = True
    assert compiled == plain and len(compiled) == 2
    # the request rows themselves ARE the join's right side here
    assert {t[2] for t in compiled} == {40, 7}


def test_materialized_join_side_cache_hits_from_serving_clone(spark):
    """The resident LAST JOIN right sides are persisted on the engine
    session but serves execute on the clone — the shared cache manager
    must still substitute them (InMemoryTableScan in the serve plan)."""
    eng = _engine(spark)
    eng.execute(
        "CREATE TABLE tm1 (c1 string, v bigint, c7 timestamp,"
        " INDEX(KEY=(c1), TS=c7))"
    )
    eng.execute(
        "INSERT INTO tm1 VALUES ('aa', 7, 1590738991000),"
        " ('aa', 8, 1590738992000), ('bb', 9, 1590738991000)"
    )
    dep = eng.execute(
        "DEPLOY dmat SELECT t0.id, tm1.v AS rv FROM t0 "
        "LAST JOIN tm1 ORDER BY tm1.c7 ON t0.c1 = tm1.c1"
    )
    got = dep.run_request_rows(_conv([(9, "aa", 40, 1590738995000)]))
    assert [(r["id"], r["rv"]) for r in got] == [(9, 8)]
    cp = dep._compiled
    assert cp is not None and cp._materialized, "right side was not offered"
    sdf = cp._fresh_serve_df()
    assert sdf.sparkSession is cp._serve_spark
    plan = sdf._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan, plan


def test_jvm_staging_timestamps_survive_non_utc_session(spark):
    """ADVICE r11: timestamps stage as epoch-micros (timezone-free on the
    wire, decoded by timestamp_micros), so a non-UTC session timezone no
    longer shifts every staged value. Pin: compiled JVM serving equals
    the uncompiled path under America/New_York for the same request
    DataFrame (the old wall-clock-string staging failed this by 4-5h)."""
    tz0 = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        eng = _engine(spark)
        dep = eng.execute(f"DEPLOY dtz {SQL}")
        req = _req(spark, dep, [(9, "aa", 40, 1590738995000)])
        compiled = sorted(map(tuple, dep.run_request(req).collect()))
        assert dep._compiled is not None and dep._compiled._jvm_mode
        # the serving clone inherited the engine session's timezone
        assert (
            dep._compiled._serve_spark.conf.get("spark.sql.session.timeZone")
            == "America/New_York"
        )
        dep.use_compiled = False
        plain = sorted(map(tuple, dep.run_request(req).collect()))
        dep.use_compiled = True
        assert compiled == plain, (compiled, plain)
        # rows arm agrees with the DataFrame arm too
        via_rows = sorted(
            map(tuple, dep.run_request_rows(_conv([(9, "aa", 40, 1590738995000)])))
        )
        assert via_rows == compiled
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)


def test_empty_request_dataframe_serves_empty(spark):
    """An empty request DataFrame through the compiled JVM path stages an
    empty batch and returns zero rows (r12 code-review regression: the
    driver-side encode crashed on zero rows where toArrow staging did
    not)."""
    eng = _engine(spark)
    dep = eng.execute(f"DEPLOY dempty {SQL}")
    empty = spark.createDataFrame([], dep.input_schema)
    assert dep.run_request(empty).collect() == []
    assert dep._compiled is not None and dep._compiled._jvm_mode
    # and a non-empty serve right after still works (staged file intact)
    got = dep.run_request(_req(spark, dep, [(9, "aa", 40, 1590738995000)]))
    assert got.collect()[0]["s"] == 30 + 31 + 40


def test_semantic_confs_resync_to_serving_clone(spark):
    """The clone's conf snapshot froze at compile; a post-deploy SET of a
    semantics-bearing conf (session timezone) must reach compiled serves
    like it reaches the uncompiled path."""
    eng = _engine(spark)
    dep = eng.execute(f"DEPLOY dsync {SQL}")
    dep.run_request_rows(_conv([(9, "aa", 40, 1590738995000)]))
    cp = dep._compiled
    assert cp is not None and cp._serve_spark is not None
    tz0 = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
    try:
        sdf = cp._fresh_serve_df()
        assert (
            cp._serve_spark.conf.get("spark.sql.session.timeZone")
            == "Asia/Tokyo"
        )
        assert sdf.sparkSession is cp._serve_spark
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)


@pytest.mark.slow
def test_concurrent_serve_df_no_cross_talk(spark):
    """r13 (r12 verdict #3): the DataFrame serve arm now stages AND
    collects under the per-plan lock and returns an eager driver-local
    result, so two concurrent run_request(df) calls on one deployment
    each get THEIR OWN rows instead of interleaving stage/collect."""
    import concurrent.futures

    eng = _engine(spark)
    dep = eng.execute(f"DEPLOY dcdf {SQL}")
    dep.run_request(_req(spark, dep, [(0, "aa", 0, 1590738995000)])).collect()

    def call(i):
        key = "aa" if i % 2 == 0 else "bb"
        df = dep.run_request(
            _req(spark, dep, [(100 + i, key, i, 1590738995000)])
        )
        rows = df.collect()
        assert len(rows) == 1
        return rows[0]["id"], rows[0]["s"], key, i

    with concurrent.futures.ThreadPoolExecutor(max_workers=8) as ex:
        results = list(ex.map(call, range(16)))
    for rid, s, key, i in results:
        hist = 30 + 31 if key == "aa" else 50
        assert rid == 100 + i and s == hist + i, (rid, s, key, i)


def test_local_relation_requests_stage_without_a_job(spark):
    """r13 (r12 verdict #5): a driver-local request plan (arrow-table
    createDataFrame -> LocalRelation) stages job-free, so the whole serve
    runs exactly ONE Spark job (the serve itself); an RDD-backed request
    frame pays the extra toArrow evaluation job. Values are pinned equal
    across the local, RDD, and rows arms — including a timestamp."""
    import pyarrow as pa

    eng = _engine(spark)
    dep = eng.execute(f"DEPLOY dloc {SQL}")
    dep.run_request_rows(_conv([(0, "aa", 0, 1590738995000)]))  # compile

    row = (9, "aa", 40, 1590738995000)
    rdd_req = _req(spark, dep, [row])
    arrow_req = spark.createDataFrame(rdd_req.toArrow(), dep.input_schema)
    assert (
        arrow_req._jdf.queryExecution()
        .optimizedPlan().getClass().getSimpleName()
        == "LocalRelation"
    )

    def jobs_during(fn):
        # job ids are monotone ints assigned per job; counting via
        # len(getJobIdsForGroup) breaks in a long-lived session because the
        # status store EVICTS old jobs under retention pressure (observed:
        # a -97 "delta" deep into a full-suite run). The max-id delta is
        # eviction-proof; the spark fixture is single-threaded so no
        # concurrent job can inflate it.
        sc = spark.sparkContext
        tracker = sc._jsc.sc().statusTracker()

        def max_id():
            ids = tracker.getJobIdsForGroup(None)
            return max(ids) if ids else -1

        before = max_id()
        out = fn()
        return out, max_id() - before

    got_local, n_local = jobs_during(
        lambda: dep.run_request(arrow_req).collect()
    )
    got_rdd, n_rdd = jobs_during(lambda: dep.run_request(rdd_req).collect())
    got_rows, n_rows = jobs_during(lambda: dep.run_request_rows(_conv([row])))
    as_tuples = lambda rows: sorted(tuple(r) for r in rows)
    assert as_tuples(got_local) == as_tuples(got_rdd) == as_tuples(got_rows)
    assert got_local[0]["s"] == 30 + 31 + 40
    # the serve plan itself may run >1 job (broadcast exchanges submit
    # their own); the pin is RELATIVE: the local-relation arm matches the
    # rows arm exactly (zero staging jobs, job-free result collect), and
    # the RDD-backed arm pays exactly one extra toArrow evaluation job
    assert n_local == n_rows, (n_local, n_rows)
    assert n_rdd == n_rows + 1, (n_rdd, n_rows)


def test_serving_shuffle_partitions_resyncs_per_serve(spark):
    """ADVICE r12: SERVING_SHUFFLE_PARTITIONS_CONF was read once at
    compile, so a later SET was silently ignored; it now re-syncs onto
    the serving clone before every serve."""
    from openmldb_spark.engine.compiled import SERVING_SHUFFLE_PARTITIONS_CONF

    eng = _engine(spark)
    dep = eng.execute(f"DEPLOY dfan {SQL}")
    dep.run_request_rows(_conv([(9, "aa", 40, 1590738995000)]))
    cp = dep._compiled
    assert cp is not None and cp._serve_spark is not None
    assert cp._serve_spark.conf.get("spark.sql.shuffle.partitions") == "1"
    spark.conf.set(SERVING_SHUFFLE_PARTITIONS_CONF, "2")
    try:
        got = dep.run_request_rows(_conv([(10, "aa", 1, 1590738996000)]))
        assert len(got) == 1
        assert cp._serve_spark.conf.get("spark.sql.shuffle.partitions") == "2"
    finally:
        spark.conf.unset(SERVING_SHUFFLE_PARTITIONS_CONF)
        dep.run_request_rows(_conv([(11, "aa", 1, 1590738997000)]))
        assert cp._serve_spark.conf.get("spark.sql.shuffle.partitions") == "1"


def test_case_sensitivity_conf_reaches_compiled_serves(spark):
    """The broadened semantic-conf registry: a post-deploy SET of
    spark.sql.caseSensitive reaches the serving clone (the registry
    contract: semantics-bearing runtime confs re-sync per serve)."""
    eng = _engine(spark)
    dep = eng.execute(f"DEPLOY dcase {SQL}")
    dep.run_request_rows(_conv([(9, "aa", 40, 1590738995000)]))
    cp = dep._compiled
    assert cp is not None and cp._serve_spark is not None
    spark.conf.set("spark.sql.caseSensitive", "true")
    try:
        cp._fresh_serve_df()
        assert cp._serve_spark.conf.get("spark.sql.caseSensitive") == "true"
    finally:
        spark.conf.set("spark.sql.caseSensitive", "false")


def test_exact_collect_plan_handles_dotted_and_nested_names(spark):
    """_exact_collect_plan must backtick-quote column names (a dotted
    name would otherwise resolve as a struct path and fail analysis) and
    decline schemas with nested timestamps or duplicate names (toArrow
    fallback)."""
    import datetime

    from pyspark.sql.types import (
        ArrayType,
        LongType,
        StructField,
        StructType,
        TimestampType,
    )

    from openmldb_spark.engine.compiled import _exact_collect_plan

    schema = StructType(
        [
            StructField("a.b", LongType()),
            StructField("t", TimestampType()),
        ]
    )
    df = spark.createDataFrame(
        [(1, datetime.datetime(2020, 5, 29, 8, 0, 0))], schema
    )
    proj, ts_idx = _exact_collect_plan(df, schema)
    assert proj is not None and ts_idx == [1]
    rows = proj.collect()
    assert rows[0]["a.b"] == 1 and isinstance(rows[0]["t"], int)

    nested = StructType([StructField("ts_arr", ArrayType(TimestampType()))])
    assert _exact_collect_plan(spark.createDataFrame([], nested), nested) == (
        None,
        None,
    )
    dup = StructType([StructField("x", LongType()), StructField("x", LongType())])
    assert _exact_collect_plan(spark.createDataFrame([], dup), dup) == (None, None)
