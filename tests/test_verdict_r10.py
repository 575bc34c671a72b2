"""Pins for the r9 verdict's "What's wrong" items #3 (DROP paths leak
persisted pre-agg caches) — save_bucketed orphan resilience (#2) is pinned
in tests/test_bucketed.py, the suite-count fix (#1) is a README process
change, and the SCALE items (#4) are probed by tools/scale_probe.py."""

import pytest

from openmldb_spark.engine import Engine


DDL = (
    "CREATE TABLE t0 (id int, c1 string, c4 bigint, c7 timestamp,"
    " INDEX(KEY=(c1), TS=c7))"
)
ROWS = [
    (1, "aa", 30, 1590738991000),
    (2, "aa", 31, 1590738992000),
    (3, "bb", 32, 1590738993000),
]
SQL = (
    "SELECT id, c1, sum(c4) OVER w1 as w1_long FROM t0 WINDOW w1 AS "
    "(PARTITION BY t0.c1 ORDER BY t0.c7 ROWS_RANGE BETWEEN 2s "
    "PRECEDING AND CURRENT ROW)"
)


def _cache_empty(spark) -> bool:
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


def _engine(spark):
    eng = Engine(spark)
    eng.execute(DDL)
    vals = ", ".join(
        "(%d, %r, %d, %d)" % r for r in ROWS
    )
    eng.execute(f"INSERT INTO t0 VALUES {vals}")
    return eng


@pytest.mark.parametrize(
    "drop_sql",
    ["DROP DEPLOYMENT d1", "DROP TABLE t0"],
    ids=["drop_deployment", "drop_table"],
)
def test_drop_releases_preagg_cache(spark, drop_sql):
    """deploy -> prepare_preagg -> DROP must leave zero entries in the
    Spark cache manager: the old paths del'd the deployment without the
    unpersist loop, leaving the .persist()ed bucket DataFrames cached
    until the ContextCleaner happened to collect them (r9 verdict #3)."""
    spark.catalog.clearCache()
    eng = _engine(spark)
    dep = eng.execute(f"DEPLOY d1 OPTIONS(long_windows='w1:2s') {SQL}")
    dep.prepare_preagg()
    assert not _cache_empty(spark)
    eng.execute(drop_sql)
    assert _cache_empty(spark), f"{drop_sql} leaked persisted pre-agg buckets"
    assert not dep._preagg


def test_drop_procedure_releases_preagg_cache(spark):
    spark.catalog.clearCache()
    eng = _engine(spark)
    dep = eng.execute(
        "CREATE PROCEDURE p1(id int, c1 string, c4 bigint, c7 timestamp) "
        f"BEGIN {SQL}; END"
    )
    dep.long_windows = {"w1": "2s"}
    dep.prepare_preagg()
    assert not _cache_empty(spark)
    eng.execute("DROP PROCEDURE p1")
    assert _cache_empty(spark), "DROP PROCEDURE leaked persisted pre-agg buckets"


def test_drop_database_releases_preagg_cache(spark):
    spark.catalog.clearCache()
    eng = _engine(spark)  # creates t0 in 'default'
    eng.execute("CREATE DATABASE lwdb")
    eng.execute("USE lwdb")
    eng.execute(DDL)
    vals = ", ".join("(%d, %r, %d, %d)" % r for r in ROWS)
    eng.execute(f"INSERT INTO t0 VALUES {vals}")
    dep = eng.execute(f"DEPLOY d2 OPTIONS(long_windows='w1:2s') {SQL}")
    dep.prepare_preagg()
    assert not _cache_empty(spark)
    eng.execute("USE default")
    eng.execute("DROP DATABASE lwdb")
    assert _cache_empty(spark), "DROP DATABASE leaked persisted pre-agg buckets"
