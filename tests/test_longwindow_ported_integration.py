"""Ported: cases/integration_test/long_window/test_long_window.yaml
(13 cases, ids 0-12) — the long-window integration tier: bucket time
units 2y/2d/2h/2m/2s, window-merge legality, the unknown-window deploy
error, the count_where deploy, and the two DELETE cases (ids 10/11) that
pin pre-agg invalidation under DML (the reference maintains its
aggregator tables on every Put/Delete, src/storage/aggregator.cc; here
`Engine.table_epoch` invalidates `SqlDeployment._preagg` and the next
serve rebuilds from live rows).

Pre-agg golden mapping (reference preAgg rows are
[key, bucket_start_ms, bucket_end_ms, rows_in_bucket, agg_value, filter]):
our `preaggregate` bucket ids map to start = bucket*bucket_ms,
end = start + bucket_ms - 1; composite keys join with '|'. DIVERGENCE
(noted per-case, DIVERGENCES #25): the reference's aggregator only
FLUSHES a bucket when a newer one opens — its preAgg goldens exclude the
newest (still-buffered) bucket per key — while this engine materializes
every bucket. The comparison therefore checks the flushed set exactly and
separately asserts the open bucket is present and correct. Row-count
buckets (bare-number bucket sizes, reference kRowsNum) are accepted at
deploy but served from raw rows (fallback), also DIVERGENCES #25.
"""

import datetime

import pytest

from openmldb_spark.engine import Engine

DDL8 = (
    "CREATE TABLE t0 (id int, c1 string, c3 int, c4 bigint, c5 float,"
    " c6 double, c7 timestamp, c8 date, INDEX(KEY=(c1), TS=c7))"
)

ROWS_2S = [  # ids 4/10: one row per second
    (1, "aa", 20, 30, 1.1, 2.1, 1590738991000, "2020-05-01"),
    (2, "aa", 21, 31, 1.2, 2.2, 1590738992000, "2020-05-02"),
    (3, "aa", 22, 32, 1.3, 2.3, 1590738993000, "2020-05-03"),
    (4, "aa", 23, 33, 1.4, 2.4, 1590738994000, "2020-05-04"),
    (5, "aa", 24, 34, 1.5, 2.5, 1590738995000, "2020-05-05"),
]
ROWS_MS = [  # ids 5-9: one row per millisecond
    (1, "aa", 20, 30, 1.1, 2.1, 1590738990000, "2020-05-01"),
    (2, "aa", 21, 31, 1.2, 2.2, 1590738990001, "2020-05-02"),
    (3, "aa", 22, 32, 1.3, 2.3, 1590738990002, "2020-05-03"),
    (4, "aa", 23, 33, 1.4, 2.4, 1590738990003, "2020-05-04"),
    (5, "aa", 24, 34, 1.5, 2.5, 1590738990004, "2020-05-05"),
]


def _engine(spark, rows, ddl=DDL8):
    eng = Engine(spark)
    eng.execute(ddl)
    vals = ", ".join(
        "(" + ", ".join(repr(v) if isinstance(v, str) else str(v) for v in r) + ")"
        for r in rows
    )
    eng.execute(f"INSERT INTO t0 VALUES {vals}")
    return eng


def _got_rows(df, ncols=3):
    return sorted(tuple(r)[:ncols] for r in df.collect())


def _flushed_and_open(dep, agg, bucket_ms, nkeys=1):
    """(flushed_rows, open_rows) from the deployment's single pre-agg cache,
    in the reference golden layout (key, start, end, cnt, value)."""
    (pre,) = dep._preagg.values()
    rows = pre.collect()
    by_key = {}
    for r in rows:
        k = "|".join(str(r[f"__lwk{i}"]) for i in range(nkeys))
        by_key.setdefault(k, []).append(r)
    pick = {"count": "cnt_v", "sum": "sum_v", "min": "min_v", "max": "max_v"}[agg]
    flushed, open_ = [], []
    for k, rs in by_key.items():
        mx = max(r["bucket"] for r in rs)
        for r in rs:
            row = (
                k,
                r["bucket"] * bucket_ms,
                r["bucket"] * bucket_ms + bucket_ms - 1,
                r["cnt_v"],
                r[pick],
            )
            (open_ if r["bucket"] == mx else flushed).append(row)
    return sorted(flushed), sorted(open_)


def _ts(ms):
    return datetime.datetime.utcfromtimestamp(ms / 1000)


# -- id 0: ROWS frame + time-unit bucket 2y -> create aggregator failed ----
def test_id0_rows_frame_with_year_bucket_fails(spark):
    eng = _engine(
        spark,
        [(1, "aa", 20, 30, 1.1, 2.1, 1262278860000, "2020-05-01")],
    )
    with pytest.raises(ValueError, match="create aggregator failed"):
        eng.execute(
            "DEPLOY d0 OPTIONS(long_windows='w1:2y') SELECT id, c1, "
            "count(c4) OVER w1 as w1_long FROM t0 WINDOW w1 AS (PARTITION "
            "BY t0.c1 ORDER BY t0.c7 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)"
        )


# -- ids 1-4: bucket time units, batch results + preAgg goldens ------------
_UNIT_CASES = [
    # (case id, bucket, agg, arg, rows, expected w1_long, frame range,
    #  bucket_ms, flushed-preagg golden)
    (
        1, "2d", "count", "c4",
        [
            (1, "aa", 20, 30, 1.1, 2.1, 1577811660000, "2020-05-01"),
            (2, "aa", 21, 31, 1.2, 2.2, 1577898060000, "2020-05-02"),
            (3, "aa", 22, 32, 1.3, 2.3, 1577984460000, "2020-05-03"),
            (4, "aa", 23, 33, 1.4, 2.4, 1578070860000, "2020-05-04"),
            (5, "aa", 24, 34, 1.5, 2.5, 1578157260000, "2020-05-05"),
        ],
        [1, 2, 3, 3, 3], "2d", 172800000,
        [
            ("aa", 1577664000000, 1577836799999, 1, 1),
            ("aa", 1577836800000, 1578009599999, 2, 2),
        ],
    ),
    (
        2, "2h", "count", "c4",
        [
            (1, "aa", 20, 30, 1.1, 2.1, 1577811661000, "2020-05-01"),
            (2, "aa", 21, 31, 1.2, 2.2, 1577815261000, "2020-05-02"),
            (3, "aa", 22, 32, 1.3, 2.3, 1577818861000, "2020-05-03"),
            (4, "aa", 23, 33, 1.4, 2.4, 1577822461000, "2020-05-04"),
            (5, "aa", 24, 34, 1.5, 2.5, 1577826061000, "2020-05-05"),
        ],
        [1, 2, 3, 3, 3], "2h", 7200000,
        [
            ("aa", 1577808000000, 1577815199999, 1, 1),
            ("aa", 1577815200000, 1577822399999, 2, 2),
        ],
    ),
    (
        3, "2m", "sum", "c4",
        [
            (1, "aa", 20, 30, 1.1, 2.1, 1577812141000, "2020-05-01"),
            (2, "aa", 21, 31, 1.2, 2.2, 1577812201000, "2020-05-02"),
            (3, "aa", 22, 32, 1.3, 2.3, 1577812261000, "2020-05-03"),
            (4, "aa", 23, 33, 1.4, 2.4, 1577812321000, "2020-05-04"),
            (5, "aa", 24, 34, 1.5, 2.5, 1577812381000, "2020-05-05"),
        ],
        [30, 61, 93, 96, 99], "2m", 120000,
        [
            ("aa", 1577812080000, 1577812199999, 1, 30),
            ("aa", 1577812200000, 1577812319999, 2, 63),
        ],
    ),
    (
        4, "2s", "sum", "c4",
        ROWS_2S,
        [30, 61, 93, 96, 99], "2s", 2000,
        [
            ("aa", 1590738990000, 1590738991999, 1, 30),
            ("aa", 1590738992000, 1590738993999, 2, 63),
        ],
    ),
]


@pytest.mark.parametrize(
    "cid,bucket,agg,arg,rows,want,rng,bucket_ms,golden",
    _UNIT_CASES,
    ids=[f"id{c[0]}_{c[1]}" for c in _UNIT_CASES],
)
def test_bucket_time_units(spark, cid, bucket, agg, arg, rows, want, rng,
                           bucket_ms, golden):
    eng = _engine(spark, rows)
    sql = (
        f"SELECT id, c1, {agg}({arg}) OVER w1 as w1_long FROM t0 WINDOW w1 "
        f"AS (PARTITION BY t0.c1 ORDER BY t0.c7 ROWS_RANGE BETWEEN {rng} "
        "PRECEDING AND CURRENT ROW)"
    )
    got = _got_rows(eng.execute(sql))
    assert got == [(r[0], "aa", w) for r, w in zip(rows, want)]
    dep = eng.execute(f"DEPLOY d{cid} OPTIONS(long_windows='w1:{bucket}') {sql}")
    dep.prepare_preagg()
    flushed, open_ = _flushed_and_open(dep, agg, bucket_ms)
    assert flushed == golden, (flushed, golden)
    # the engine also materializes the newest (reference: still-buffered)
    # bucket — present, covering the remaining rows
    assert sum(r[3] for r in flushed) + sum(r[3] for r in open_) == len(rows)
    # preagg-served request == raw request (end-to-end rewrite check)
    reqs = spark.createDataFrame(
        [(9, "aa", 30, 40, 2.0, 3.0, _ts(rows[-1][6] + 1000), None)],
        dep.input_schema,
    )
    got_p = [tuple(r) for r in dep.run_request_preagg(reqs).collect()]
    got_r = [tuple(r) for r in dep.run_request(reqs).collect()]
    assert got_p == got_r


# -- ids 5-8: window-merge legality (long+short / long+long / mixed keys) --
_MERGE_CASES = [
    (
        5, "w1:2",
        "SELECT id, c1, sum(c4) OVER w1 as w1_long, count(c4) OVER w2 as "
        "w2_long from t0 WINDOW w1 AS (PARTITION BY t0.c1 ORDER BY t0.c7 "
        "ROWS_RANGE BETWEEN 2 PRECEDING AND CURRENT ROW), w2 AS (PARTITION "
        "BY t0.c1 ORDER BY t0.c7 ROWS_RANGE BETWEEN 3 PRECEDING AND CURRENT ROW)",
        ROWS_MS,
        [(1, "aa", 30, 1), (2, "aa", 61, 2), (3, "aa", 93, 3),
         (4, "aa", 96, 4), (5, "aa", 99, 4)],
    ),
    (
        6, "w1:2,w2:2",
        "SELECT id, c1, sum(c4) OVER w1 as w1_long, min(c3) OVER w2 as "
        "w2_long from t0 WINDOW w1 AS (PARTITION BY t0.c1 ORDER BY t0.c7 "
        "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), w2 AS (PARTITION BY "
        "t0.c1 ORDER BY t0.c7 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)",
        ROWS_MS,
        [(1, "aa", 30, 20), (2, "aa", 61, 20), (3, "aa", 93, 20),
         (4, "aa", 96, 20), (5, "aa", 99, 21)],
    ),
    (
        7, "w1:2",
        "SELECT id, c1, sum(c4) OVER w1 as w1_long, avg(c3) OVER w2 as "
        "w2_c3_avg, count(c3) OVER w3 as w3_c3_count from t0 WINDOW w1 AS "
        "(PARTITION BY t0.c1 ORDER BY t0.c7 ROWS BETWEEN 2 PRECEDING AND "
        "CURRENT ROW), w2 AS (PARTITION BY t0.c1 ORDER BY t0.c7 ROWS "
        "BETWEEN 1 PRECEDING AND CURRENT ROW), w3 AS (PARTITION BY t0.c1 "
        "ORDER BY t0.c7 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)",
        ROWS_MS,
        [(1, "aa", 30, 20.0, 1), (2, "aa", 61, 20.5, 2),
         (3, "aa", 93, 21.5, 3), (4, "aa", 96, 22.5, 4),
         (5, "aa", 99, 23.5, 4)],
    ),
    (
        8, "w1:2",
        "SELECT id, c1, c3, sum(c4) OVER w1 as w1_long, count(c5) OVER w2 "
        "as w2_c5_count from t0 WINDOW w1 AS (PARTITION BY t0.c1 ORDER BY "
        "t0.c7 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), w2 AS (PARTITION "
        "BY t0.c3 ORDER BY t0.c7 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)",
        [
            (1, "aa", 20, 30, 1.1, 2.1, 1590738990000, "2020-05-01"),
            (2, "aa", 20, 31, 1.2, 2.2, 1590738990001, "2020-05-02"),
            (3, "aa", 20, 32, 1.3, 2.3, 1590738990002, "2020-05-03"),
            (4, "aa", 20, 33, 1.4, 2.4, 1590738990003, "2020-05-04"),
            (5, "aa", 24, 34, 1.5, 2.5, 1590738990004, "2020-05-05"),
        ],
        [(1, "aa", 20, 30, 1), (2, "aa", 20, 61, 2), (3, "aa", 20, 93, 3),
         (4, "aa", 20, 96, 3), (5, "aa", 24, 99, 1)],
    ),
]


@pytest.mark.parametrize(
    "cid,lw,sql,rows,want", _MERGE_CASES, ids=[f"id{c[0]}" for c in _MERGE_CASES]
)
def test_window_merge_shapes(spark, cid, lw, sql, rows, want):
    eng = _engine(spark, rows)
    got = _got_rows(eng.execute(sql), ncols=len(want[0]))
    assert got == want
    # the deploy with count-bucket / ROWS-frame long_windows is ACCEPTED
    # (function-tier corpus) and served via the raw-request fallback —
    # results must match the plain request path exactly
    dep = eng.execute(f"DEPLOY dm{cid} OPTIONS(long_windows='{lw}') {sql}")
    assert dep._lw_items() == []  # nothing preagg-servable: fallback path
    reqs = spark.createDataFrame(
        [(9, "aa", 20, 40, 2.0, 3.0, _ts(1590738990005), None)],
        dep.input_schema,
    )
    got_p = [tuple(r) for r in dep.run_request_preagg(reqs).collect()]
    got_r = [tuple(r) for r in dep.run_request(reqs).collect()]
    assert got_p == got_r


# -- id 9: unknown window name in long_windows -> deploy error -------------
def test_id9_unknown_window_rejected(spark):
    eng = _engine(spark, ROWS_MS)
    with pytest.raises(ValueError, match="doesn't match window in sql"):
        eng.execute(
            "DEPLOY d9 OPTIONS(long_windows='w2:2') SELECT id, c1, "
            "sum(c4) OVER w1 as w1_c4_sum FROM t0 WINDOW w1 AS (PARTITION "
            "BY t0.c1 ORDER BY t0.c7 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)"
        )


# -- ids 10/11: DELETE invalidates the pre-agg -----------------------------
@pytest.mark.parametrize(
    "cid,part,delete,nkeys",
    [
        (10, "t0.c1", "delete from t0 where c1='aa'", 1),
        (11, "t0.c1,t0.c3", "delete from t0 where c1='aa' and c3=20", 2),
    ],
    ids=["id10_delete_pk", "id11_delete_composite"],
)
def test_delete_invalidates_preagg(spark, cid, part, delete, nkeys):
    rows = (
        ROWS_2S
        if cid == 10
        else [
            (1, "aa", 20, 30, 1.1, 2.1, 1590738991000, "2020-05-01"),
            (2, "aa", 20, 31, 1.2, 2.2, 1590738992000, "2020-05-02"),
            (3, "aa", 20, 32, 1.3, 2.3, 1590738993000, "2020-05-03"),
            (4, "aa", 20, 33, 1.4, 2.4, 1590738994000, "2020-05-04"),
            (5, "aa", 20, 34, 1.5, 2.5, 1590738995000, "2020-05-05"),
        ]
    )
    key = "aa" if nkeys == 1 else "aa|20"
    eng = _engine(spark, rows)
    sel = "id, c1, sum(c4) OVER w1 as w1_long" if nkeys == 1 else \
        "id, c1, c3, sum(c4) OVER w1 as w1_long"
    sql = (
        f"SELECT {sel} FROM t0 WINDOW w1 AS (PARTITION BY {part} ORDER BY "
        "t0.c7 ROWS_RANGE BETWEEN 2s PRECEDING AND CURRENT ROW)"
    )
    # step 1: batch result + flushed preAgg golden
    want_vals = [30, 61, 93, 96, 99]
    got = _got_rows(eng.execute(sql), ncols=2 + nkeys)
    assert [r[-1] for r in got] == want_vals
    dep = eng.execute(f"DEPLOY dd{cid} OPTIONS(long_windows='w1:2s') {sql}")
    dep.prepare_preagg()
    flushed, _ = _flushed_and_open(dep, "sum", 2000, nkeys=nkeys)
    assert flushed == [
        (key, 1590738990000, 1590738991999, 1, 30),
        (key, 1590738992000, 1590738993999, 2, 63),
    ]
    # serve once so the cache is hot (the staleness repro needs a hit)
    req_row = (9, "aa", 30, 40, 2.0, 3.0, _ts(1590738996000), None) \
        if nkeys == 1 else (9, "aa", 20, 40, 2.0, 3.0, _ts(1590738996000), None)
    reqs = spark.createDataFrame([req_row], dep.input_schema)
    before = dep.run_request_preagg(reqs).collect()[0]["w1_long"]
    # rows 4+5 in the inclusive [t-2s, t] range + the request row itself
    assert before == 33 + 34 + 40

    # step 2: DELETE empties the key -> pre-agg must not serve stale buckets
    eng.execute(delete)
    after = dep.run_request_preagg(reqs).collect()[0]["w1_long"]
    assert after == 40, "stale pre-agg served deleted rows"
    raw = dep.run_request(reqs).collect()[0]["w1_long"]
    assert after == raw
    # reference golden: preAgg count 0 after the delete
    dep.prepare_preagg()
    (pre,) = dep._preagg.values()
    assert pre.count() == 0


# -- id 12: count_where over a 2s long window ------------------------------
def test_id12_count_where_long_window(spark):
    # reference declares a second identical input table the SQL never
    # references — omitted here
    eng = Engine(spark)
    eng.execute(
        "CREATE TABLE t0 (id int, c1 string, c2 smallint, c3 int, c4 bigint,"
        " c5 float, c6 double, c7 timestamp, c8 date, c9 bool,"
        " INDEX(KEY=(c1), TS=c7))"
    )
    rows = [
        (1, "aa", 1, 20, 30, 1.1, 2.1, 1590738990000, "2020-05-01", "true"),
        (2, "aa", 2, 21, 31, 1.2, 2.2, 1590738991000, "2020-05-02", "true"),
        (3, "aa", 3, 22, 32, 1.3, 2.3, 1590738992000, "2020-05-03", "true"),
        (4, "aa", 4, 23, 33, 1.4, 2.4, 1590738993000, "2020-05-04", "true"),
        (5, "aa", 5, 24, 34, 1.5, 2.5, 1590738994000, "2020-05-05", "false"),
    ]
    vals = ", ".join(
        f"({i}, '{c1}', {c2}, {c3}, {c4}, {c5}, {c6}, {ts}, '{d}', {b})"
        for i, c1, c2, c3, c4, c5, c6, ts, d, b in rows
    )
    eng.execute(f"INSERT INTO t0 VALUES {vals}")
    sql = (
        "SELECT id, c1, count_where(c3, c2<4) OVER w1 as w1_count FROM t0 "
        "WINDOW w1 AS (PARTITION BY t0.c1 ORDER BY t0.c7 ROWS_RANGE "
        "BETWEEN 2s PRECEDING AND CURRENT ROW)"
    )
    got = _got_rows(eng.execute(sql))
    assert got == [(1, "aa", 1), (2, "aa", 2), (3, "aa", 3), (4, "aa", 2),
                   (5, "aa", 1)]
    dep = eng.execute(f"DEPLOY d12 OPTIONS(long_windows='w1:2s') {sql}")
    reqs = spark.createDataFrame(
        [(9, "aa", 3, 30, 40, 2.0, 3.0, _ts(1590738995000), None, True)],
        dep.input_schema,
    )
    got_p = [tuple(r) for r in dep.run_request_preagg(reqs).collect()]
    got_r = [tuple(r) for r in dep.run_request(reqs).collect()]
    assert got_p == got_r
    assert dep._preagg, "filter-keyed preagg path did not engage"


# -- the r8 verdict's direct staleness repros (beyond the corpus) ----------
@pytest.mark.slow
def test_insert_invalidates_preagg(spark):
    eng = _engine(spark, ROWS_2S)
    sql = (
        "SELECT id, c1, sum(c4) OVER w1 as w1_long FROM t0 WINDOW w1 AS "
        "(PARTITION BY t0.c1 ORDER BY t0.c7 ROWS_RANGE BETWEEN 2s "
        "PRECEDING AND CURRENT ROW)"
    )
    dep = eng.execute(f"DEPLOY di OPTIONS(long_windows='w1:2s') {sql}")
    reqs = spark.createDataFrame(
        [(9, "aa", 30, 40, 2.0, 3.0, _ts(1590738996000), None)],
        dep.input_schema,
    )
    assert dep.run_request_preagg(reqs).collect()[0]["w1_long"] == 33 + 34 + 40
    eng.execute(
        "INSERT INTO t0 VALUES (6, 'aa', 25, 100, 1.6, 2.6, "
        "1590738995500, '2020-05-06')"
    )
    got = dep.run_request_preagg(reqs).collect()[0]["w1_long"]
    assert got == 33 + 34 + 100 + 40, "stale pre-agg missed inserted row"
    assert got == dep.run_request(reqs).collect()[0]["w1_long"]


def test_unchanged_table_reuses_preagg_cache(spark):
    """No DML between serves -> the persisted buckets are reused, not
    rebuilt (the point of the cache)."""
    eng = _engine(spark, ROWS_2S)
    sql = (
        "SELECT id, c1, sum(c4) OVER w1 as w1_long FROM t0 WINDOW w1 AS "
        "(PARTITION BY t0.c1 ORDER BY t0.c7 ROWS_RANGE BETWEEN 2s "
        "PRECEDING AND CURRENT ROW)"
    )
    dep = eng.execute(f"DEPLOY dc OPTIONS(long_windows='w1:2s') {sql}")
    dep.prepare_preagg()
    (first,) = dep._preagg.values()
    dep.prepare_preagg()
    (second,) = dep._preagg.values()
    assert first is second


@pytest.mark.slow
def test_explicit_history_switch_invalidates_preagg(spark):
    """r9 review finding: the cache token for an explicit history was
    id(history) — CPython can reuse the id after GC, inheriting a stale
    cache. The deployment now holds the history reference and compares by
    identity: a DIFFERENT history DataFrame must rebuild the buckets."""
    eng = _engine(spark, ROWS_2S)
    sql = (
        "SELECT id, c1, sum(c4) OVER w1 as w1_long FROM t0 WINDOW w1 AS "
        "(PARTITION BY t0.c1 ORDER BY t0.c7 ROWS_RANGE BETWEEN 2s "
        "PRECEDING AND CURRENT ROW)"
    )
    dep = eng.execute(f"DEPLOY dh OPTIONS(long_windows='w1:2s') {sql}")
    reqs = spark.createDataFrame(
        [(9, "aa", 30, 40, 2.0, 3.0, _ts(1590738996000), None)],
        dep.input_schema,
    )
    full = eng.tables["t0"]
    h1 = full.where("id <= 3")
    h2 = full.where("id >= 4")
    got1 = dep.run_request_preagg(reqs, history=h1).collect()[0]["w1_long"]
    got2 = dep.run_request_preagg(reqs, history=h2).collect()[0]["w1_long"]
    assert got1 == 40            # rows 1-3 out of the 2s range: request only
    assert got2 == 33 + 34 + 40  # rows 4+5 + request
    # and switching back to engine-store history also rebuilds
    got3 = dep.run_request_preagg(reqs).collect()[0]["w1_long"]
    assert got3 == 33 + 34 + 40


def test_expression_partition_key_not_pruned(spark):
    """r9 review finding: request-serving history pruning must NOT fire
    for EXPRESSION partition keys (PARTITION BY id % 2 groups different
    id values into one frame; pruning on `id` would drop frame members).
    The request row must see every same-parity history row in range."""
    eng = _engine(spark, ROWS_2S)
    dep = eng.execute(
        "DEPLOY dexpr SELECT id, sum(c4) OVER w1 as s FROM t0 WINDOW w1 "
        "AS (PARTITION BY id % 2 ORDER BY t0.c7 ROWS_RANGE BETWEEN 10s "
        "PRECEDING AND CURRENT ROW)"
    )
    reqs = spark.createDataFrame(
        [(9, "aa", 30, 40, 2.0, 3.0, _ts(1590738996000), None)],
        dep.input_schema,
    )
    got = dep.run_request(reqs).collect()[0]["s"]
    # id=9 is odd: frames rows with odd ids (1, 3, 5 -> c4 30+32+34) + 40
    assert got == 30 + 32 + 34 + 40
