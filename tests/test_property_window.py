"""Property-based checks (hypothesis): the window engine and LAST JOIN
against a direct pure-Python evaluation of the dialect semantics on random
inputs. The reference has no property tests (SURVEY §5) — this is an
upgrade: it hunts frame-boundary/tie/NULL corners no hand-written golden
covers.

One Spark round-trip per example is too slow, so each example builds a
whole random table and every row is checked.
"""

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from openmldb_spark.functions import aggregates as A
from openmldb_spark.operators.window import WindowDef, window_agg
from openmldb_spark.sql import sql as osql


ROWS = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),                  # key
        st.integers(min_value=0, max_value=30),       # ts (dense -> ties)
        st.one_of(st.none(), st.integers(-5, 5)),     # value (nullable)
    ),
    min_size=1,
    max_size=25,
)


def _py_frames(rows, range_ms=None, nrows=None, maxsize=None, exclude_current_row=False):
    """Per input row: the list of (ts, v) in its frame, dialect semantics.
    rows: list of (key, ts, v, uid); order within ties = uid asc."""
    out = {}
    by_key = {}
    for k, t, v, uid in rows:
        by_key.setdefault(k, []).append((t, uid, v))
    for k, items in by_key.items():
        items.sort(key=lambda x: (x[0], x[1]))
        for i, (t, uid, v) in enumerate(items):
            if nrows is not None:
                # ROWS frames are positional: n rows before this one
                frame = items[max(0, i - nrows): i + 1]
            else:
                # RANGE frames are peer-inclusive: every row whose ts falls
                # in [t - r, t], including same-ts rows after this one
                frame = [e for e in items if t - range_ms <= e[0] <= t]
            # EXCLUDE CURRENT_ROW defines the window (minus current) and
            # MAXSIZE caps it to the most recent rows, in that order
            if exclude_current_row:
                frame = [e for e in frame if e[1] != uid]
            if maxsize is not None and len(frame) > maxsize:
                frame = frame[-maxsize:]
            out[uid] = [e[2] for e in frame]
    return out


def _agg(vals, fn):
    xs = [v for v in vals if v is not None]
    if fn == "count":
        return len(xs)
    if not xs:
        return None
    return {"sum": sum, "min": min, "max": max}[fn](xs)


@pytest.fixture(scope="module")
def sp(spark):
    return spark


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(data=ROWS, rng=st.integers(1, 8), fn=st.sampled_from(["sum", "count", "min", "max"]))
def test_rows_range_frames_match_python(sp, data, rng, fn):
    rows = [(k, t, v, i) for i, (k, t, v) in enumerate(data)]
    df = sp.createDataFrame(rows, "k string, ts long, v long, uid long")
    wd = WindowDef(partition_by=["k"], order_by="ts", rows_range=rng, tiebreak="uid")
    spec = {"sum": A.sum_, "count": A.count_, "min": A.min_, "max": A.max_}[fn]("v")
    got = {r["uid"]: r["x"] for r in window_agg(df, wd, {"x": spec}).collect()}
    want = {
        uid: _agg(vals, fn)
        for uid, vals in _py_frames(rows, range_ms=rng).items()
    }
    assert got == want


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(data=ROWS, nrows=st.integers(0, 6))
@pytest.mark.slow
def test_rows_frames_match_python(sp, data, nrows):
    rows = [(k, t, v, i) for i, (k, t, v) in enumerate(data)]
    df = sp.createDataFrame(rows, "k string, ts long, v long, uid long")
    wd = WindowDef(partition_by=["k"], order_by="ts", rows=nrows, tiebreak="uid")
    got = {r["uid"]: r["x"] for r in window_agg(df, wd, {"x": A.sum_("v")}).collect()}
    want = {uid: _agg(v, "sum") for uid, v in _py_frames(rows, nrows=nrows).items()}
    assert got == want


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(data=ROWS, rng=st.integers(2, 8), maxsize=st.integers(1, 4), excl=st.booleans())
@pytest.mark.slow
def test_maxsize_exclude_match_python(sp, data, rng, maxsize, excl):
    rows = [(k, t, v, i) for i, (k, t, v) in enumerate(data)]
    df = sp.createDataFrame(rows, "k string, ts long, v long, uid long")
    wd = WindowDef(
        partition_by=["k"], order_by="ts", rows_range=rng,
        maxsize=maxsize, exclude_current_row=excl, tiebreak="uid",
    )
    got = {r["uid"]: r["x"] for r in window_agg(df, wd, {"x": A.sum_("v")}).collect()}
    want = {
        uid: _agg(v, "sum")
        for uid, v in _py_frames(
            rows, range_ms=rng, maxsize=maxsize, exclude_current_row=excl
        ).items()
    }
    assert got == want


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    left=st.lists(st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 20)),
                  min_size=1, max_size=12),
    right=st.lists(st.tuples(st.sampled_from(["a", "b"]), st.integers(0, 20),
                             st.integers(0, 100)),
                   min_size=0, max_size=12),
)
@pytest.mark.slow
def test_last_join_matches_python(sp, left, right):
    lrows = [(k, t, i) for i, (k, t) in enumerate(left)]
    rrows = [(k, rts, v, i) for i, (k, rts, v) in enumerate(right)]
    ldf = sp.createDataFrame(lrows, "k string, ts long, lid long")
    rdf = sp.createDataFrame(rrows, "k string, rts long, v long, rid long")
    out = osql(
        sp,
        "SELECT t1.lid, t2.rid FROM t1 LAST JOIN t2 "
        "ORDER BY t2.rts, t2.rid ON t1.k = t2.k AND t2.rts <= t1.ts",
        {"t1": ldf, "t2": rdf},
    )
    got = {r["lid"]: r["rid"] for r in out.collect()}
    want = {}
    for k, t, lid in lrows:
        matches = [(rts, rid) for (rk, rts, v, rid) in rrows if rk == k and rts <= t]
        want[lid] = max(matches)[1] if matches else None
    assert got == want


# ---------------------------------------------------------------------------
# frame-nested UDAFs (r8): random tables vs a pure-Python model of the
# reference semantics (inner aggregates = frame-final constants)
# ---------------------------------------------------------------------------

NN_ROWS = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),                  # pk
        st.integers(min_value=-9, max_value=9),       # c1
        st.one_of(st.none(), st.sampled_from(["x", "y", "z"])),  # c2
    ),
    min_size=1,
    max_size=20,
)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(NN_ROWS, st.integers(min_value=1, max_value=6))
@pytest.mark.slow
def test_property_frame_nested_sum_count(spark, rows, nrows):
    # sum(c1 - count(c1)) over a bounded ROWS frame == per the reference:
    # for each row, K = count of frame rows, result = sum(c1_i - K)
    data = [(i, pk, c1, c2) for i, (pk, c1, c2) in enumerate(rows)]
    df = spark.createDataFrame(data, "id long, pk string, c1 int, c2 string")
    out = osql(
        spark,
        f"""
        SELECT t.id,
          sum(c1 - count(c1)) OVER w1 AS r,
          count_where(id, c2 = lag(c2, 0)) OVER w1 AS cw
        FROM t
        WINDOW w1 AS (PARTITION BY t.pk ORDER BY t.id
                      ROWS BETWEEN {nrows} PRECEDING AND CURRENT ROW)
        """,
        {"t": df},
    ).collect()
    got = {r["id"]: (r["r"], r["cw"]) for r in out}
    by_pk: dict = {}
    for i, pk, c1, c2 in data:
        by_pk.setdefault(pk, []).append((i, c1, c2))
    for pk, items in by_pk.items():
        for j, (i, c1, c2) in enumerate(items):
            frame = items[max(0, j - nrows): j + 1]
            k = len(frame)  # count(c1): c1 never null here
            exp_r = sum(x[1] - k for x in frame)
            cur = c2  # lag(c2, 0) = current row's value
            if cur is None:
                # NULL = NULL is not true: no rows match
                exp_cw = 0
            else:
                exp_cw = sum(1 for x in frame if x[2] == cur)
            assert got[i] == (exp_r, exp_cw), (
                i, got[i], (exp_r, exp_cw), frame, cur
            )


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(
    st.tuples(st.sampled_from(["a", "b"]),
              st.one_of(st.none(), st.sampled_from(["k1:v1,k2:v2", "k3:v3", "", "k1:v1"]))),
    min_size=1, max_size=15,
))
def test_property_fused_list_aggs(spark, rows):
    # join/count/distinct_count over window_split == a Python model of
    # the reference semantics (rows ts-desc, pieces left-to-right,
    # NULL rows skipped)
    data = [(i, pk, s) for i, (pk, s) in enumerate(rows)]
    df = spark.createDataFrame(data, "id long, pk string, s string")
    out = osql(
        spark,
        """
        SELECT t.id,
          `join`(window_split(s, ","), " ") OVER w1 AS j,
          count(window_split(s, ",")) OVER w1 AS c,
          distinct_count(window_split(s, ",")) OVER w1 AS dc
        FROM t
        WINDOW w1 AS (PARTITION BY t.pk ORDER BY t.id
                      ROWS BETWEEN 10 PRECEDING AND CURRENT ROW)
        """,
        {"t": df},
    ).collect()
    got = {r["id"]: (r["j"], r["c"], r["dc"]) for r in out}
    by_pk: dict = {}
    for i, pk, s in data:
        by_pk.setdefault(pk, []).append((i, s))
    for pk, items in by_pk.items():
        for j_ix, (i, s) in enumerate(items):
            frame = items[max(0, j_ix - 10): j_ix + 1]
            pieces: list = []
            for _, sv in reversed(frame):  # rows ts-desc
                if sv is None:
                    continue
                pieces.extend(sv.split(","))
            exp = (" ".join(pieces), len(pieces), len(set(pieces)))
            assert got[i] == exp, (i, got[i], exp, frame)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    data=ROWS,
    nrows=st.integers(0, 6),
    buckets=st.integers(2, 5),
)
@pytest.mark.slow
def test_rows_skew_split_matches_python(sp, data, nrows, buckets):
    """r13 ROWS-frame skew splitting vs the pure-Python oracle: random
    dense-ts data (heavy ties), random frame length and bucket count —
    the count-based replication must be exact at every boundary."""
    from openmldb_spark.operators.window_skew import window_agg_skewed

    rows = [(k, t, v, i) for i, (k, t, v) in enumerate(data)]
    df = sp.createDataFrame(rows, "k string, ts long, v long, uid long")
    wd = WindowDef(partition_by=["k"], order_by="ts", rows=nrows, tiebreak="uid")
    got = {
        r["uid"]: r["x"]
        for r in window_agg_skewed(df, wd, {"x": A.sum_("v")}, buckets=buckets).collect()
    }
    want = {uid: _agg(v, "sum") for uid, v in _py_frames(rows, nrows=nrows).items()}
    assert got == want


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(data=ROWS, rng=st.integers(1, 8), buckets=st.integers(2, 5))
@pytest.mark.slow
def test_range_skew_split_matches_python(sp, data, rng, buckets):
    """ROWS_RANGE skew splitting vs the pure-Python oracle on random
    tie-heavy data (the hand-written family pins equality vs window_agg;
    this pins equality vs the independent semantics oracle)."""
    from openmldb_spark.operators.window_skew import window_agg_skewed

    rows = [(k, t, v, i) for i, (k, t, v) in enumerate(data)]
    df = sp.createDataFrame(rows, "k string, ts long, v long, uid long")
    wd = WindowDef(partition_by=["k"], order_by="ts", rows_range=rng, tiebreak="uid")
    got = {
        r["uid"]: r["x"]
        for r in window_agg_skewed(df, wd, {"x": A.sum_("v")}, buckets=buckets).collect()
    }
    want = {
        uid: _agg(v, "sum") for uid, v in _py_frames(rows, range_ms=rng).items()
    }
    assert got == want
