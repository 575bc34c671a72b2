"""Batch-request golden cases — the reference's
``cases/function/test_batch_request.yaml`` executed through DEPLOY +
``SqlDeployment.run_batch_request`` (the common-column optimization,
SURVEY §4.1 / ``hybridse/src/vm/batch_request_optimize.h:40-56``).

Each case: statements build the stored tables, ``deploy`` is the SELECT,
``request`` carries the batch rows + the common column names, and the
expectation is the per-request-row output (request semantics: each row's
frames see stored history + that row only).
"""

import glob
import os

import pytest

try:
    import yaml
except ImportError:
    yaml = None

from test_yaml_cases import _SPARK_TYPES, _eq, _parse_rows, _parse_schema, smoke_stride

CASE_DIR = os.path.join(os.path.dirname(__file__), "batch_request_cases")


def _load_cases():
    if yaml is None:
        return []
    # these ported request-mode cases average ~18s each (multi-table DDL +
    # request replay): the default gate keeps the first case of each file
    # plus every smoke_stride-th one (r14 test-gate budget)
    stride = smoke_stride(9)
    out = []
    for path in sorted(glob.glob(os.path.join(CASE_DIR, "*.yaml"))):
        doc = yaml.safe_load(open(path))
        for i, case in enumerate(doc["cases"]):
            if i % stride:
                continue
            out.append(
                pytest.param(case, id=f"{os.path.basename(path)}:{case['id']}")
            )
    return out


def _build_requests(spark, block):
    schema = _parse_schema(block["schema"])
    ddl = ", ".join(f"`{n}` {_SPARK_TYPES[t]}" for n, t in schema)
    return spark.createDataFrame(_parse_rows(block["data"], schema), ddl)


@pytest.mark.parametrize("case", _load_cases())
def test_batch_request_case(spark, case):
    from openmldb_spark.engine import Engine

    eng = Engine(spark)
    for stmt in case.get("statements", []):
        eng.execute(stmt)
    dep = eng.execute(f"DEPLOY dep_{case['id']} {case['deploy']}")
    req_block = case["request"]
    # the ported request schema types timestamps as int64 ms; align to the
    # deployed table's schema (real TIMESTAMP columns) via the contract
    requests = _build_requests(spark, req_block)
    if dep.input_schema is not None:
        from pyspark.sql import functions as F

        cast = []
        for f, (n, _) in zip(dep.input_schema.fields, _parse_schema(req_block["schema"])):
            st = f.dataType.simpleString()
            if st.startswith("timestamp"):
                cast.append(F.timestamp_millis(F.col(n)).alias(n))
            else:
                cast.append(F.col(n).cast(f.dataType).alias(n))
        requests = requests.select(*cast)
    common = req_block.get("common", [])
    out = dep.run_batch_request(requests, common)

    if case["expect"].get("success") is True:
        out.collect()
        return
    exp_schema = _parse_schema(case["expect"]["schema"])
    exp_rows = _parse_rows(case["expect"]["data"], exp_schema)
    assert out.columns == [n for n, _ in exp_schema]
    got = [tuple(r) for r in out.collect()]
    order_col = case["expect"].get("order")
    if order_col:
        idx = [n for n, _ in exp_schema].index(order_col)
        got.sort(key=lambda r: (r[idx] is None, r[idx]))
        exp_rows.sort(key=lambda r: (r[idx] is None, r[idx]))
    assert len(got) == len(exp_rows), f"{len(got)} rows != {len(exp_rows)}"
    for g, e in zip(got, exp_rows):
        for gv, ev, (name, typ) in zip(g, e, exp_schema):
            assert _eq(gv, ev, typ), (
                f"case {case['id']}: column {name}: {gv!r} != {ev!r}\n"
                f"got row: {g}\nexp row: {e}"
            )


def test_common_subplan_computed_once(spark):
    """The common items must be evaluated on ONE representative row, not
    per request row — the whole point of BatchRequestOptimize."""
    from openmldb_spark.engine import Engine

    eng = Engine(spark)
    eng.execute("CREATE TABLE bt (id int, k string, ts bigint, v double)")
    eng.execute(
        "INSERT INTO bt VALUES (1,'a',1000,1.0), (2,'a',2000,2.0), (3,'a',3000,3.0)"
    )
    dep = eng.execute(
        "DEPLOY bq SELECT id, sum(v) OVER w1 AS sv FROM bt WINDOW w1 AS "
        "(PARTITION BY k ORDER BY ts ROWS BETWEEN 10 PRECEDING AND CURRENT ROW)"
    )
    reqs = spark.createDataFrame(
        [(4, "a", 4000, 4.0), (5, "a", 4000, 4.0), (6, "a", 4000, 4.0)],
        "id int, k string, ts long, v double",
    )
    calls = []
    orig = dep._run_request_on

    def spy(q, requests, history=None):
        calls.append((len(q.body.items), requests.count()))
        return orig(q, requests, history)

    dep._run_request_on = spy
    out = dep.run_batch_request(reqs, ["k", "ts", "v"])
    rows = {r["id"]: r["sv"] for r in out.collect()}
    # every request row sees history (1+2+3) + itself (4) = 10
    assert rows == {4: 10.0, 5: 10.0, 6: 10.0}
    # the window item ran on a 1-row request; only the trivial id item ran
    # on the full batch
    assert sorted(calls) == [(1, 1), (1, 3)], calls
