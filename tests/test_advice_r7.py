"""Regression tests for the round-6 ADVICE items (fixed in round 7):

1. (medium) run_batch_request: a join right-side column that SHADOWS a
   request-column name (``t1.c1`` qualified ref) must not be classified
   common when the join keys are non-common — the joined-in value is
   per-row, a representative-row broadcast would be wrong.
2. (low) _mangle_sql: a table alias that equals a database name must bind
   the alias, not mangle/strip the qualifier (`SELECT d.c1 FROM t AS d`
   with a database named `d`).
3. (low) _strict_csv header=true: only the FIRST physical row of each file
   is header-stripped — a legitimate data row whose cells all equal the
   column names is kept.
4. (low) loader._parse_ddl: parameterized types (decimal(10,2)) split on
   top-level commas only.
"""

import pytest
from pyspark.sql import functions as F

from openmldb_spark.engine import Engine
from openmldb_spark.sources.loader import _parse_ddl


@pytest.fixture()
def eng(spark):
    return Engine(spark)


def test_batch_request_shadowed_join_column_not_common(eng, spark):
    # request table t1 and join table t2 BOTH have a column named c1;
    # the join key k is NOT common, so t2.c1 is a per-row joined value
    eng.execute("CREATE TABLE req (c1 int, k int, ts bigint)")
    eng.execute("CREATE TABLE dim (c1 int, k int, rts bigint)")
    eng.execute(
        "INSERT INTO dim VALUES (100, 1, 10), (200, 2, 10), (300, 3, 10)"
    )
    dep = eng.execute(
        "DEPLOY sh1 SELECT t1.c1 AS a, t2.c1 AS b "
        "FROM req t1 LAST JOIN dim t2 ORDER BY t2.rts ON t1.k = t2.k"
    )
    requests = spark.createDataFrame(
        [(7, 1, 1000), (7, 2, 2000), (7, 3, 3000)], "c1 int, k int, ts bigint"
    )
    plain = {
        (r["a"], r["b"]) for r in dep.run_request(requests).collect()
    }
    opt = {
        (r["a"], r["b"])
        for r in dep.run_batch_request(requests, ["c1"]).collect()
    }
    # per-row join values must survive the common-column optimization
    assert opt == plain == {(7, 100), (7, 200), (7, 300)}


def test_mangle_skips_alias_matching_db_name(eng):
    eng.execute("CREATE DATABASE d")
    eng.execute("CREATE TABLE t (c1 int, c2 string)")
    eng.execute("INSERT INTO t VALUES (1, 'x'), (2, 'y')")
    # `d` is a database AND the declared alias — the alias wins in scope
    out = eng.execute("SELECT d.c1 FROM t AS d")
    assert sorted(r["c1"] for r in out.collect()) == [1, 2]
    # bare-alias form (no AS) too
    out2 = eng.execute("SELECT d.c2 FROM t d")
    assert sorted(r["c2"] for r in out2.collect()) == ["x", "y"]
    # a genuine db-qualified ref still mangles/resolves
    eng.execute("USE d")
    eng.execute("CREATE TABLE u (c1 int)")
    eng.execute("INSERT INTO u VALUES (9)")
    eng.execute("USE default")
    assert eng.execute("SELECT c1 FROM d.u").collect()[0]["c1"] == 9


def test_strict_csv_keeps_data_row_matching_header(eng, tmp_path):
    # an all-string table whose data row coincidentally equals the header
    p = str(tmp_path / "h.csv")
    with open(p, "w") as fh:
        fh.write("id,name\nid,name\n1,x\n")
    eng.execute("CREATE TABLE hh (id string, name string)")
    eng.execute(
        f"LOAD DATA INFILE '{p}' INTO TABLE hh "
        "OPTIONS(format='csv', header=true, mode='append')"
    )
    rows = {tuple(r) for r in eng.execute("SELECT * FROM hh").collect()}
    # first physical row (the real header) stripped; the lookalike kept
    assert rows == {("id", "name"), ("1", "x")}


def test_strict_csv_append_parts_with_headers_roundtrip(eng, tmp_path):
    # a directory of part files, each with its own header line (what our
    # own SELECT INTO mode='append' writes) — one header stripped per file
    d = tmp_path / "parts"
    d.mkdir()
    (d / "part-0.csv").write_text("id,name\n1,x\n")
    (d / "part-1.csv").write_text("id,name\n2,y\n")
    eng.execute("CREATE TABLE pp (id int, name string)")
    eng.execute(
        f"LOAD DATA INFILE '{d}' INTO TABLE pp "
        "OPTIONS(format='csv', header=true, mode='append')"
    )
    rows = {tuple(r) for r in eng.execute("SELECT * FROM pp").collect()}
    assert rows == {(1, "x"), (2, "y")}


def test_parse_ddl_parameterized_types():
    cols = _parse_ddl("a decimal(10,2), b varchar(20), c int")
    assert cols == [("a", "decimal(10,2)"), ("b", "varchar(20)"), ("c", "int")]
