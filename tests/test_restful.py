"""API-server behaviors beyond the ported restful corpus: the real HTTP
socket layer, the POST /dbs/{db} query route (modes, DDL, parse errors),
CREATE/DROP PROCEDURE statement errors, map-style request rows, and a
non-poisoned const procedure actually splitting common_cols_data.

Reference: ``src/apiserver/api_server_impl.cc`` (routes ``:85-94``)."""

import json
import urllib.request

import pytest

from openmldb_spark.engine import Engine
from openmldb_spark.restful import ApiServer


@pytest.fixture()
def api(spark):
    eng = Engine(spark)
    eng.execute("create database d1;")
    eng.execute("use d1;")
    eng.execute(
        "create table t1 (c1 string, c3 int, c7 timestamp,"
        " index(name=index1, key=c1, ts=c7));"
    )
    return ApiServer(eng)


def test_http_socket_roundtrip(api):
    port = api.serve()
    try:
        def call(method, path, body=None):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{path}",
                data=body.encode() if body else None,
                method=method,
            )
            with urllib.request.urlopen(req) as f:
                return json.loads(f.read().decode())

        assert call("GET", "/dbs") == {"code": 0, "msg": "ok", "dbs": ["d1"]}
        r = call("PUT", "/dbs/d1/tables/t1",
                 json.dumps({"value": [["aa", 1, 1620471840256]]}))
        assert r == {"code": 0, "msg": "ok"}
        r = call("POST", "/dbs/d1",
                 json.dumps({"sql": "select c1, c3 from t1;", "mode": "online"}))
        assert r["code"] == 0
        assert r["data"]["schema"] == ["String", "Int32"]
        assert r["data"]["data"] == [["aa", 1]]
        assert call("GET", "/nope") == {"code": -1, "msg": "no match method"}
    finally:
        api.close()


def test_query_route_modes_and_errors(api):
    h = api.handle
    # invalid mode
    r = h("POST", "/dbs/d1", json.dumps({"sql": "select 1;", "mode": "bogus"}))
    assert r == {"code": -1, "msg": "Invalid mode bogus"}
    # bad json
    assert h("POST", "/dbs/d1", "{nope")["msg"].startswith("Json parse failed")
    # unknown db
    assert h("POST", "/dbs/zz", json.dumps({"sql": "select 1;"})) == {
        "code": -1, "msg": "DB not found"
    }
    # DDL through the query route, then data is visible
    r = h("POST", "/dbs/d1", json.dumps(
        {"sql": "insert into t1 values ('x', 9, 1620471840256);",
         "mode": "online"}))
    assert r == {"code": 0, "msg": "ok"}
    r = h("POST", "/dbs/d1", json.dumps(
        {"sql": "select c3 from t1;", "mode": "online"}))
    assert r["data"]["data"] == [[9]]
    # offline mode reads the (empty) offline store
    r = h("POST", "/dbs/d1", json.dumps(
        {"sql": "select c3 from t1;", "mode": "offsync"}))
    assert r["data"]["data"] == []
    # the mode switch is request-scoped: the session stays online
    assert api.engine.variables["execute_mode"] == "online"
    # engine-level SQL errors surface as code -1
    r = h("POST", "/dbs/d1", json.dumps({"sql": "select * from nope;"}))
    assert r["code"] == -1
    # refresh is a no-op success
    assert h("POST", "/refresh") == {"code": 0, "msg": "ok"}


def test_procedure_statement_errors(api):
    eng = api.engine
    eng.execute(
        "create procedure p1(c1 string, c3 int, c7 timestamp)"
        " BEGIN SELECT * FROM t1; END;"
    )
    with pytest.raises(ValueError, match="already exists"):
        eng.execute(
            "create procedure p1(c1 string, c3 int, c7 timestamp)"
            " BEGIN SELECT * FROM t1; END;"
        )
    # signature must match the request table's schema
    with pytest.raises(ValueError, match="does not match"):
        eng.execute(
            "create procedure p2(c1 string, c3 bigint, c7 timestamp)"
            " BEGIN SELECT * FROM t1; END;"
        )
    with pytest.raises(ValueError, match="does not match"):
        eng.execute(
            "create procedure p3(c1 string, c3 int)"
            " BEGIN SELECT * FROM t1; END;"
        )
    # body must be a SELECT
    with pytest.raises(ValueError, match="SELECT"):
        eng.execute(
            "create procedure p4(c1 string, c3 int, c7 timestamp)"
            " BEGIN insert into t1 values ('a', 1, 0); END;"
        )
    # DROP PROCEDURE only drops procedures
    eng.execute("deploy dep1 select * from t1;")
    with pytest.raises(ValueError, match="not found"):
        eng.execute("drop procedure dep1;")
    eng.execute("drop procedure p1;")
    assert "p1" not in eng.deployments
    # GET kind filtering: a deployment is not a procedure and vice versa
    assert api.handle("GET", "/dbs/d1/procedures/dep1")["msg"] == (
        "procedure not found"
    )
    eng.execute(
        "create procedure p1(c1 string, c3 int, c7 timestamp)"
        " BEGIN SELECT * FROM t1; END;"
    )
    assert api.handle("GET", "/dbs/d1/deployments/p1")["msg"] == (
        "deployment not found"
    )


def test_exec_common_cols_split_and_map_rows(api):
    """A const procedure WITHOUT join poisoning: common outputs are computed
    and returned in common_cols_data, non-common in data — and map-style
    input rows produce map-style output rows keyed by non-common names."""
    eng = api.engine
    eng.execute(
        "create procedure psplit(c1 string, const c3 int, c7 timestamp)"
        " BEGIN SELECT c1, c3, count(c7) OVER w1 AS n FROM t1"
        " WINDOW w1 AS (PARTITION BY c1 ORDER BY c7"
        " ROWS BETWEEN 2 PRECEDING AND CURRENT ROW); END;"
    )
    body = {
        "common_cols": [7],
        "input": [["aa", 1620471840256], ["bb", 1620471840257]],
        "need_schema": True,
    }
    r = api.handle("POST", "/dbs/d1/procedures/psplit", json.dumps(body))
    assert r["code"] == 0, r
    # c3 is const and un-poisoned -> common; c1 and the window are per-row
    assert r["data"]["common_cols_data"] == [7]
    assert r["data"]["data"] == [["aa", 1], ["bb", 1]]
    assert r["data"]["schema"] == [
        {"name": "c1", "type": "string"},
        {"name": "c3", "type": "int32"},
        {"name": "n", "type": "int64"},
    ]
    # map-style rows: resolved by column name, answered as maps
    body = {
        "common_cols": [7],
        "input": [{"c1": "zz", "c7": 1620471840256}],
    }
    r = api.handle("POST", "/dbs/d1/procedures/psplit", json.dumps(body))
    assert r["code"] == 0, r
    assert r["data"]["data"] == [{"c1": "zz", "n": 1}]
    # missing column in a map row
    body["input"] = [{"c1": "zz"}]
    r = api.handle("POST", "/dbs/d1/procedures/psplit", json.dumps(body))
    assert r["code"] == -1
    assert "can't find col c7" in r["msg"]


def test_get_procedure_info_shape(api):
    eng = api.engine
    eng.execute(
        "create procedure pinfo(c1 string, const c3 int, c7 timestamp)"
        " BEGIN SELECT c1, c3 FROM t1; END;"
    )
    r = api.handle("GET", "/dbs/d1/procedures/pinfo")
    assert r["code"] == 0
    d = r["data"]
    assert d["name"] == "pinfo"
    assert d["dbs"] == ["d1"]
    assert d["tables"] == ["t1"]
    assert d["input_common_cols"] == ["c3"]
    assert d["output_common_cols"] == ["c3"]
    assert d["procedure"].lower().startswith("create procedure pinfo")


def test_write_nan_and_inf_null(api):
    eng = api.engine
    eng.execute(
        "create table tf (c1 string, v double, c7 timestamp,"
        " index(key=c1, ts=c7));"
    )
    eng.execute("insert into tf values ('a', 0.0, 1620471840256);")
    r = api.handle(
        "POST",
        "/dbs/d1",
        json.dumps({"sql": "select sqrt(-1) as bad, v from tf;",
                    "mode": "online", "write_nan_and_inf_null": True}),
    )
    assert r["code"] == 0
    assert r["data"]["data"] == [[None, 0.0]]
