"""Regression tests for the round-7 ADVICE items (fixed in round 8):

1. (high) engine: offline INSERT must write through the _off_parts ledger
   so a later LOAD DATA mode='append' (or ALTER TABLE ADD OFFLINE_PATH)
   does not rebuild from base=None and silently discard the inserted rows.
2. (low) DROP PROCEDURE db.sp routes pre-mangle (the dotted qualifier
   must reach _dep_lookup intact, like SHOW CREATE PROCEDURE).
3. (low) restful MODE_MAP: mode 'online' is ASYNC in the reference
   (api_server_impl.cc:134-139 — {"online", {true, false}}); only
   'onsync' is online+sync.
4. (low) statement_kind classifies '(SELECT ...) EXCEPT SELECT ...' as
   kQuery, matching execute()'s set-op head check.
5. (low) restful _exec: output_schema=None (parameterized body) with zero
   output rows returns an empty payload, not an AttributeError.
"""

import json

import pytest

from openmldb_spark.engine import Engine
from openmldb_spark.restful import MODE_MAP, ApiServer


@pytest.fixture()
def eng(spark):
    return Engine(spark)


def test_offline_insert_survives_append_load(eng, tmp_path):
    # ADVICE r7 repro: insert ('ins',1) offline, then LOAD DATA
    # mode='append' -> SELECT must return BOTH rows
    p = str(tmp_path / "x.csv")
    with open(p, "w") as fh:
        fh.write("name,v\nloaded,2\n")
    eng.execute("CREATE TABLE t8 (name string, v int)")
    eng.execute("SET @@execute_mode = 'offline'")
    eng.execute("INSERT INTO t8 VALUES ('ins', 1)")
    eng.execute(
        f"LOAD DATA INFILE '{p}' INTO TABLE t8 "
        "OPTIONS(format='csv', header=true, mode='append')"
    )
    rows = {tuple(r) for r in eng.execute("SELECT * FROM t8").collect()}
    assert rows == {("ins", 1), ("loaded", 2)}


def test_offline_insert_survives_add_offline_path(eng, spark, tmp_path):
    d = str(tmp_path / "sym.parquet")
    spark.createDataFrame([("sym", 3)], "name string, v int").write.parquet(d)
    eng.execute("CREATE TABLE t9 (name string, v int)")
    eng.execute("SET @@execute_mode = 'offline'")
    eng.execute("INSERT INTO t9 VALUES ('ins', 1)")
    eng.execute(f"ALTER TABLE t9 ADD OFFLINE_PATH '{d}'")
    rows = {tuple(r) for r in eng.execute("SELECT * FROM t9").collect()}
    assert rows == {("ins", 1), ("sym", 3)}
    # dropping the symbolic path keeps the inserted base rows
    eng.execute(f"ALTER TABLE t9 DROP OFFLINE_PATH '{d}'")
    rows = {tuple(r) for r in eng.execute("SELECT * FROM t9").collect()}
    assert rows == {("ins", 1)}


def test_drop_procedure_db_qualified(eng):
    eng.execute("CREATE DATABASE db1")
    eng.execute("USE db1")
    eng.execute("CREATE TABLE tp (c1 int, c2 bigint)")
    eng.execute(
        "CREATE PROCEDURE sp1 (c1 int, c2 bigint) "
        "BEGIN SELECT c1, c2 FROM tp; END"
    )
    eng.execute("USE default")
    eng.execute("DROP PROCEDURE db1.sp1")
    with pytest.raises(ValueError, match="unknown deployment"):
        eng.execute("SHOW CREATE PROCEDURE db1.sp1")


def test_mode_map_online_is_async():
    assert MODE_MAP["online"] == ("online", False)
    assert MODE_MAP["onsync"] == ("online", True)


def test_http_online_load_data_returns_job_info(eng, tmp_path):
    p = str(tmp_path / "a.csv")
    with open(p, "w") as fh:
        fh.write("c1,c3\naa,1\n")
    eng.execute("create database d1;")
    eng.execute("use d1;")
    eng.execute("create table t1 (c1 string, c3 int);")
    api = ApiServer(eng)
    r = api.handle(
        "POST",
        "/dbs/d1",
        json.dumps(
            {
                "sql": f"LOAD DATA INFILE '{p}' INTO TABLE t1 "
                "OPTIONS(format='csv', header=true, mode='append');",
                "mode": "online",
            }
        ),
    )
    assert r["code"] == 0
    # async: the statement returned job info, not a data payload
    job = eng.jobman.jobs[max(eng.jobman.jobs)]
    job.wait(60)
    assert job.state == "FINISHED"
    rows = {tuple(x) for x in eng.execute("SELECT * FROM t1").collect()}
    assert rows == {("aa", 1)}


def test_statement_kind_paren_except(eng):
    assert (
        eng.statement_kind("(SELECT 1 AS a) EXCEPT (SELECT 2 AS a)") == "kQuery"
    )
    assert (
        eng.statement_kind("(SELECT 1 AS a) INTERSECT (SELECT 1 AS a)")
        == "kQuery"
    )


def test_restful_exec_no_schema_empty_rows(eng, spark):
    # parameterized deployment body (output_schema=None) + a request row
    # the serving path filters out -> empty data payload, not an
    # AttributeError that handle() (which catches ValueError only) lets
    # escape with no JSON response
    eng.execute("create database d1;")
    eng.execute("use d1;")
    eng.execute("create table t1 (c1 string, c3 int);")
    eng.execute("DEPLOY dp1 SELECT c1, c3 FROM t1 WHERE c3 > ?;")
    dep = eng._db_deps["d1"]["dp1"]
    assert dep.output_schema is None
    # bind the request path to an empty result (the filtered-out case)
    dep.run_request = lambda req_df, **kw: req_df.limit(0)
    api = ApiServer(eng)
    r = api.handle(
        "POST",
        "/dbs/d1/deployments/dp1",
        json.dumps({"input": [["aa", -5]]}),
    )
    assert r["code"] == 0
    assert r["data"]["data"] == []
