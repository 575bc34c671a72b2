"""Round-7 statement-surface tests: user admin, ALTER TABLE offline paths,
SHOW TABLE STATUS / COMPONENTS / PROCEDURES / CREATE PROCEDURE / JOBLOG /
JOBS FROM, EXPLAIN, RIGHT/FULL JOIN, and the parser validations the plan
corpus pinned (reference: cases/plan/*.yaml, docs/en/openmldb_sql/ddl/*)."""

from __future__ import annotations

import datetime

import pytest

from openmldb_spark.engine import Engine
from openmldb_spark.sql import parser as P


@pytest.fixture()
def eng(spark, tmp_path):
    e = Engine(spark)
    e.execute(
        "CREATE TABLE t1 (id int, c1 string, ts timestamp, "
        "INDEX(KEY=c1, TS=ts)) OPTIONS (storage_mode='HDD', partitionnum=8)"
    )
    e.execute("INSERT INTO t1 VALUES (1, 'a', 1000), (2, 'b', 2000)")
    return e


# -- users ---------------------------------------------------------------


def test_user_admin_lifecycle(eng):
    eng.execute("CREATE USER user1")
    eng.execute("CREATE USER IF NOT EXISTS user1")
    with pytest.raises(ValueError):
        eng.execute("CREATE USER user1")
    eng.execute("CREATE USER user3 OPTIONS (password='123456')")
    assert eng.users["user3"] == "123456"
    # ALTER without SET OPTIONS succeeds and changes nothing (doc example)
    eng.execute("ALTER USER user1")
    eng.execute('ALTER USER user3 SET OPTIONS (password="999")')
    assert eng.users["user3"] == "999"
    eng.execute("ALTER USER IF EXISTS nobody SET OPTIONS(password='x')")
    with pytest.raises(ValueError):
        eng.execute("ALTER USER nobody SET OPTIONS(password='x')")
    eng.execute("DROP USER user1")
    eng.execute("DROP USER IF EXISTS user1")
    with pytest.raises(ValueError):
        eng.execute("DROP USER user1")
    with pytest.raises(ValueError):
        eng.execute("DROP USER root")
    # only password is a legal option
    with pytest.raises(ValueError):
        eng.execute("CREATE USER u9 OPTIONS (role='admin')")
    rows = eng.execute("SHOW CURRENT_USER").collect()
    assert [r["User"] for r in rows] == ["root"]


# -- ALTER TABLE offline_path ---------------------------------------------


def _write_part(spark, path, rows):
    spark.createDataFrame(
        rows, "id int, c1 string, ts timestamp"
    ).write.mode("overwrite").parquet(path)


def test_alter_table_offline_paths(eng, spark, tmp_path):
    p1, p2 = str(tmp_path / "p1.parquet"), str(tmp_path / "p2.parquet")
    ts = datetime.datetime(2020, 1, 1)
    _write_part(spark, p1, [(9, "z", ts)])
    _write_part(spark, p2, [(10, "y", ts)])
    eng.execute(f"ALTER TABLE t1 ADD offline_path '{p1}'")
    eng.execute(f"ALTER TABLE t1 ADD offline_path '{p2}'")
    eng.execute("SET @@execute_mode='offline'")
    assert {r.id for r in eng.execute("SELECT id FROM t1").collect()} == {9, 10}
    # combined add+drop action list, one statement
    eng.execute(f"ALTER TABLE t1 DROP offline_path '{p2}', ADD offline_path '{p2}'")
    assert {r.id for r in eng.execute("SELECT id FROM t1").collect()} == {9, 10}
    eng.execute(f"ALTER TABLE t1 DROP offline_path '{p1}'")
    assert {r.id for r in eng.execute("SELECT id FROM t1").collect()} == {10}
    eng.execute(f"ALTER TABLE t1 DROP offline_path '{p2}'")
    assert eng.execute("SELECT id FROM t1").count() == 0
    eng.execute("SET @@execute_mode='online'")
    # online reads never see symbolic paths
    eng.execute(f"ALTER TABLE t1 ADD offline_path '{p1}'")
    assert {r.id for r in eng.execute("SELECT id FROM t1").collect()} == {1, 2}
    with pytest.raises(ValueError):
        eng.execute(f"ALTER TABLE t1 ADD offline_path '{p1}'")  # dup
    with pytest.raises(ValueError):
        eng.execute("ALTER TABLE t1 DROP offline_path '/nope'")
    with pytest.raises(ValueError):
        eng.execute("ALTER TABLE nope ADD offline_path '/x'")
    with pytest.raises(ValueError):
        eng.execute("ALTER TABLE t1 RENAME TO t2")


def test_offline_overwrite_drops_symbolic_paths(eng, spark, tmp_path):
    """The reference's mode=overwrite import clears ALL offline info,
    symbolic links included."""
    p1 = str(tmp_path / "sym.parquet")
    csv = tmp_path / "in.csv"
    csv.write_text("id,c1,ts\n7,q,3000\n")
    _write_part(spark, p1, [(9, "z", datetime.datetime(2020, 1, 1))])
    eng.execute(f"ALTER TABLE t1 ADD offline_path '{p1}'")
    eng.execute("SET @@execute_mode='offline'")
    eng.execute(
        f"LOAD DATA INFILE '{csv}' INTO TABLE t1 OPTIONS (mode='overwrite')"
    )
    assert {r.id for r in eng.execute("SELECT id FROM t1").collect()} == {7}
    status = eng.execute("SHOW TABLE STATUS").collect()[0]
    assert status["Offline_symbolic_paths"] is None


# -- SHOW TABLE STATUS / COMPONENTS / PROCEDURES ---------------------------


def test_show_table_status(eng, spark, tmp_path):
    row = eng.execute("SHOW TABLE STATUS").collect()[0]
    assert row["Table_name"] == "t1"
    assert row["Database_name"] == "default"
    assert row["Storage_type"] == "hdd"
    assert row["Rows"] == "2"
    assert row["Replica"] == "1"
    assert row["Warnings"] == ""
    # LIKE matches database names across all dbs
    eng.execute("CREATE DATABASE db2")
    eng.execute("USE db2")
    eng.execute("CREATE TABLE u1 (a int)")
    both = eng.execute("SHOW TABLE STATUS LIKE '%'").collect()
    assert {(r["Database_name"], r["Table_name"]) for r in both} == {
        ("default", "t1"), ("db2", "u1")
    }
    only = eng.execute("SHOW TABLE STATUS LIKE 'db_'").collect()
    assert [r["Table_name"] for r in only] == ["u1"]
    assert only[0]["Storage_type"] == "memory"
    # no pattern -> current database only
    assert [r["Table_name"] for r in eng.execute("SHOW TABLE STATUS").collect()] == ["u1"]


def test_show_components(eng):
    rows = eng.execute("SHOW COMPONENTS").collect()
    assert [r["Role"] for r in rows] == ["tablet", "nameserver", "taskmanager"]
    assert all(r["Status"] == "online" for r in rows)
    assert [r["Ns_role"] for r in rows] == [None, "master", None]
    assert all(isinstance(r["Connect_time"], datetime.datetime) for r in rows)


def test_show_procedures_and_show_create(eng):
    eng.execute("DEPLOY dep1 SELECT id, c1 FROM t1;")
    eng.execute(
        "CREATE PROCEDURE sp1(id int, c1 string, ts timestamp) "
        "BEGIN SELECT id FROM t1; END"
    )
    rows = eng.execute("SHOW PROCEDURES").collect()
    # deployments ARE procedures in the reference's listing
    assert {(r["DB"], r["SP"]) for r in rows} == {("default", "dep1"), ("default", "sp1")}
    rows2 = eng.execute("SHOW PROCEDURE STATUS").collect()
    assert len(rows2) == len(rows)
    ddl = eng.execute("SHOW CREATE PROCEDURE sp1").collect()[0]
    assert ddl["Procedure"] == "sp1"
    assert ddl["Create Procedure"].startswith("CREATE PROCEDURE sp1")
    with pytest.raises(ValueError):
        eng.execute("SHOW CREATE PROCEDURE missing")


# -- EXPLAIN ----------------------------------------------------------------


def test_explain_physical_and_logical(eng):
    plan = eng.execute("EXPLAIN SELECT id FROM t1 WHERE id > 1;").collect()[0]["plan"]
    assert "Filter" in plan or "filter" in plan.lower()
    lplan = eng.execute("EXPLAIN LOGICAL SELECT id FROM t1;").collect()[0]["plan"]
    assert "Project" in lplan
    with pytest.raises(ValueError):
        eng.execute("EXPLAIN DROP TABLE t1")


# -- jobs surface -------------------------------------------------------------


def test_show_joblog_and_jobs_from(eng, tmp_path):
    eng.execute(
        f"SELECT id FROM t1 INTO OUTFILE '{tmp_path/'o.csv'}' OPTIONS (mode='overwrite')"
    )
    log = eng.execute("SHOW JOBLOG 1").collect()[0]["log"]
    assert log.startswith("Stdout:")
    assert "Stderr:" in log and "finished" in log
    assert eng.execute("SHOW JOBS FROM TASKMANAGER").count() == 1
    assert eng.execute("SHOW JOBS FROM NAMESERVER").count() == 0
    assert eng.execute("SHOW JOBS FROM TASKMANAGER LIKE '1'").count() == 1
    assert eng.execute("SHOW JOBS FROM TASKMANAGER LIKE '9'").count() == 0
    with pytest.raises(ValueError):
        eng.execute("SHOW JOBLOG")
    with pytest.raises(ValueError):
        eng.execute("SHOW JOBS FROM ELSEWHERE")
    # EXIT is the CLI session terminator — a no-op statement here
    assert eng.execute("EXIT;") is None


# -- CREATE TABLE extensions --------------------------------------------------


def test_create_table_composite_types(eng):
    eng.execute(
        "CREATE TABLE tc (id int, member ARRAY<STRING> NOT NULL, "
        "attrs MAP<STRING, INT>, nested ARRAY<MAP<STRING, BIGINT>>)"
    )
    assert eng.tables["tc"].schema.simpleString() == (
        "struct<id:int,member:array<string>,attrs:map<string,int>,"
        "nested:array<map<string,bigint>>>"
    )
    with pytest.raises(ValueError):
        eng.execute("CREATE TABLE bad (a ARRAY<STRING)")


def test_create_table_like_parquet(eng, spark, tmp_path):
    src = str(tmp_path / "src.parquet")
    spark.createDataFrame([(1, "a")], "id int, v string").write.parquet(src)
    eng.execute(f"CREATE TABLE tl LIKE PARQUET 'file://{src}'")
    assert eng.tables["tl"].schema.simpleString() == "struct<id:int,v:string>"
    assert eng.tables["tl"].count() == 0  # schema only, no data
    with pytest.raises(ValueError):
        eng.execute("CREATE TABLE th LIKE HIVE 'hive://db.t'")
    assert Engine.statement_kind("create table t1 like parquet 'p'") == "CREATE"


# -- right/full joins ---------------------------------------------------------


def test_right_and_full_join(eng):
    eng.execute("CREATE TABLE r1 (id int, v string)")
    eng.execute("INSERT INTO r1 VALUES (2, 'x'), (3, 'y')")
    rows = eng.execute(
        "SELECT t1.id as lid, r1.id as rid, r1.v FROM t1 "
        "RIGHT JOIN r1 ON t1.id = r1.id"
    ).collect()
    assert {(r.lid, r.rid) for r in rows} == {(2, 2), (None, 3)}
    rows = eng.execute(
        "SELECT t1.id as lid, r1.id as rid FROM t1 FULL JOIN r1 ON t1.id = r1.id"
    ).collect()
    assert {(r.lid, r.rid) for r in rows} == {(1, None), (2, 2), (None, 3)}


# -- round-7 self-review regressions ------------------------------------------


def test_overwrite_resets_offline_format(eng, tmp_path):
    """Review finding: mode=overwrite kept the stale Offline_format."""
    csv = tmp_path / "a.csv"
    csv.write_text("id,c1,ts\n7,q,3000\n")
    eng.execute("SET @@execute_mode='offline'")
    eng.execute(f"LOAD DATA INFILE '{csv}' INTO TABLE t1 OPTIONS (mode='append')")
    assert eng._off_parts[("default", "t1")]["fmt"] == "csv"
    pq = tmp_path / "b.parquet"
    eng.tables["t1"].limit(0).write.parquet(str(pq))
    eng.execute(
        f"LOAD DATA INFILE '{pq}' INTO TABLE t1 "
        "OPTIONS (mode='overwrite', format='parquet')"
    )
    assert eng._off_parts[("default", "t1")]["fmt"] == "parquet"


def test_alter_table_multi_action_is_atomic(eng, spark, tmp_path):
    """Review finding: a failed action list must not half-apply."""
    p1 = str(tmp_path / "p1.parquet")
    _write_part(spark, p1, [(9, "z", datetime.datetime(2020, 1, 1))])
    with pytest.raises(ValueError):
        eng.execute(
            f"ALTER TABLE t1 ADD offline_path '{p1}', DROP offline_path '/missing'"
        )
    # nothing applied, no dangling ledger entry
    assert ("default", "t1") not in eng._off_parts


def test_parenthesized_set_op_executes(eng):
    rows = eng.execute(
        "(SELECT id FROM t1 LIMIT 1) UNION ALL (SELECT id FROM t1)"
    ).collect()
    assert len(rows) == 3


def test_trailing_limit_applies_to_whole_union(eng):
    """Review follow-up: a trailing LIMIT binds to the set operation, not
    the last arm."""
    n = eng.execute(
        "SELECT id FROM t1 UNION ALL SELECT id FROM t1 LIMIT 3"
    ).count()
    assert n == 3


def test_statement_kind_min_int64(eng):
    assert Engine.statement_kind(
        "INSERT INTO t VALUES (-9223372036854775808);"
    ) == "kInsertStmt"
    with pytest.raises(ValueError):
        Engine.statement_kind("INSERT INTO t VALUES (9223372036854775808);")


def test_malformed_admin_statements_raise_valueerror(eng):
    for bad in [
        "SHOW JOBS FROM",
        "SHOW JOBS FROM TASKMANAGER LIKE",
        "CREATE USER;",
        "CREATE TABLE tz (a int) OPTIONS (storage_mode='bogus')",
    ]:
        with pytest.raises(ValueError):
            eng.execute(bad)
    assert ";" not in eng.users


# -- parser validations pinned by the plan corpus -----------------------------


def test_parser_rejections():
    for bad in [
        "SELECT sum(c1) over w1 FROM t1 WINDOW "
        "w1 AS (PARTITION BY k ORDER BY ts ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), "
        "w1 AS (PARTITION BY k2 ORDER BY ts ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)",
        "SELECT sum(c1) over w2 FROM t1 WINDOW "
        "w1 AS (PARTITION BY k ORDER BY ts ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)",
        "SELECT sum(c1) OVER (PARTITION BY k ORDER BY ts ROWS BETWEEN "
        "2 PRECEDING AND CURRENT ROW MAXSIZE 5) FROM t1",
        "SELECT sum(c1) OVER (PARTITION BY k ORDER BY ts ROWS BETWEEN "
        "0 PRECEDING AND 2 PRECEDING) FROM t1",
        "SELECT 100ss",
        "select uId, 0xFF from t",
        "SELECT * FROM t1 UNION SELECT * FROM t2",
        "SELECT * FROM t1 UNION ALL SELECT * FROM t2 UNION DISTINCT SELECT * FROM t3",
        "SELECT * FROM t1 LIMIT 10 UNION ALL SELECT * FROM t2",
        "SELECT * FROM t PIVOT(a FOR b IN (x))",
        "select db.t1.col1.level4 from t",
        "select col1 from db.t.level3",
        "select 'a' in () from t1",
        "SELECT COL1 FROM t1 order by COL1",
    ]:
        with pytest.raises((SyntaxError, ValueError)):
            P.parse(bad)


def test_parser_acceptances():
    for good in [
        "(SELECT * FROM t1 LIMIT 10) UNION ALL (SELECT * FROM t2 "
        "UNION DISTINCT SELECT * FROM t3)",
        "SELECT * FROM t1 UNION ALL SELECT * FROM t2 UNION ALL SELECT * FROM t3",
        "SELECT sum(c1) OVER (PARTITION BY k ORDER BY ts ROWS_RANGE BETWEEN "
        "10s PRECEDING AND 1s PRECEDING) FROM t1",
        "SELECT 2L + 1, 3.0f, 1e5 FROM t1",
        "SELECT a FROM t1 RIGHT JOIN t2 ON t1.a = t2.a",
        "SELECT a FROM t1 FULL OUTER JOIN t2 ON t1.a = t2.a",
    ]:
        P.parse(good)


# -- backquoted identifiers ----------------------------------------------------


def test_backquoted_identifiers_end_to_end(spark):
    """cases/plan/back_quote_identifier.yaml executes, not just parses:
    `t-1`/`a-1` normalize to one table across DDL/DML/query/DESC/DROP."""
    e = Engine(spark)
    e.execute("create table `t-1` (`a-1` int, `b-1` string, index(key=`a-1`))")
    e.execute("insert into `t-1` values (1, 'x'), (2, 'y')")
    rows = e.execute(
        "select `a-1`, `b-1` from `t-1` where `a-1` > 1"
    ).collect()
    assert [(r[0], r[1]) for r in rows] == [(2, "y")]
    assert [r[0] for r in e.execute("SHOW TABLES").collect()] == ["t-1"]
    assert e.execute("DESC `t-1`").collect()[0]["field"] == "a-1"
    e.execute("DROP TABLE `t-1`")
    assert "t-1" not in e.tables


def test_drop_function_if_exists(eng):
    with pytest.raises(ValueError):
        eng.execute("DROP FUNCTION no_such_fn")
    eng.execute("DROP FUNCTION IF EXISTS no_such_fn")  # guarded: no error
