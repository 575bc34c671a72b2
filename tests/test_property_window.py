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
def test_rows_frames_match_python(sp, data, nrows):
    rows = [(k, t, v, i) for i, (k, t, v) in enumerate(data)]
    df = sp.createDataFrame(rows, "k string, ts long, v long, uid long")
    wd = WindowDef(partition_by=["k"], order_by="ts", rows=nrows, tiebreak="uid")
    got = {r["uid"]: r["x"] for r in window_agg(df, wd, {"x": A.sum_("v")}).collect()}
    want = {uid: _agg(v, "sum") for uid, v in _py_frames(rows, nrows=nrows).items()}
    assert got == want


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(data=ROWS, rng=st.integers(2, 8), maxsize=st.integers(1, 4), excl=st.booleans())
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
