"""catalog.apply_ttl: all four TTL types, lazily computed absolute bound
(ref: src/storage/segment.h Gc4TTL/Gc4Head; TTL semantics
docs/en/openmldb_sql/ddl/CREATE_TABLE_STATEMENT.md)."""

from pyspark.sql import functions as F

from openmldb_spark.catalog import IndexDef, apply_ttl


def _df(spark, rows):
    df = spark.createDataFrame(rows, "pk string, ts string, v int")
    return df.withColumn("ts", F.to_timestamp("ts"))


ROWS = [
    ("a", "2024-01-01 00:00:00", 1),
    ("a", "2024-01-02 00:00:00", 2),
    ("a", "2024-01-03 00:00:00", 3),
    ("a", "2024-01-10 00:00:00", 4),
    ("b", "2024-01-09 00:00:00", 5),
    ("b", "2024-01-10 00:00:00", 6),
]


def test_ttl_absolute_lazy_bound(spark):
    df = _df(spark, ROWS)
    idx = IndexDef("i", ["pk"], "ts", "2d", "absolute")
    kept = apply_ttl(df, idx)
    # max ts 2024-01-10; bound = 01-08: keeps 01-10 (a), 01-09+01-10 (b)
    assert sorted(r["v"] for r in kept.collect()) == [4, 5, 6]
    assert kept.columns == df.columns


def test_ttl_absandlat_keeps_duplicate_rows(spark):
    # regression: union+distinct collapsed genuinely duplicate source rows
    rows = ROWS + [("a", "2024-01-10 00:00:00", 4)]  # exact duplicate row
    df = _df(spark, rows)
    idx = IndexDef("i", ["pk"], "ts", "2d&&1", "absandlat")
    kept = apply_ttl(df, idx)
    # kept if within 2d of max OR among latest 1 per key; the duplicate
    # (a, 01-10) row must appear TWICE
    vs = sorted(r["v"] for r in kept.collect())
    assert vs == [4, 4, 5, 6]


def test_ttl_absorlat(spark):
    df = _df(spark, ROWS)
    idx = IndexDef("i", ["pk"], "ts", "2d||2", "absorlat")
    kept = apply_ttl(df, idx)
    # kept only if within 2d of max AND among latest 2 per key
    assert sorted(r["v"] for r in kept.collect()) == [4, 5, 6]


def test_ttl_latest(spark):
    df = _df(spark, ROWS)
    idx = IndexDef("i", ["pk"], "ts", "2", "latest")
    kept = apply_ttl(df, idx)
    assert sorted(r["v"] for r in kept.collect()) == [3, 4, 5, 6]
