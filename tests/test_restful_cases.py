"""REST API golden cases — the reference's APIServer HTTP/JSON corpus
(``cases/restful/v230/*.yaml`` + ``cases/restful/v030/
test_execute_deployment.yaml``) executed against
:class:`openmldb_spark.restful.ApiServer`.

Files live under tests/restful_cases/. Case format (flattened from the
reference's baseCase-inheritance form by the porter):

.. code-block:: yaml

   cases:
     - id: show_databases_0
       statements: [...]        # engine SQL setup
       method: GET
       uri: /dbs
       body: '{"json": "string"}'   # optional request body
       expect:                  # matched against the response JSON
         code: 0
         msg: ok
         dbs: [test1]           # top-level keys compare exactly
         paths:                 # dotted-path assertions ($.x.y[0].z)
           table.name: t1

One case additionally runs over a real socket (tests/test_restful.py covers
the HTTP layer itself).
"""

import glob
import json
import os

import pytest

try:
    import yaml
except ImportError:
    yaml = None

from test_yaml_cases import shard_files, smoke_stride

CASE_DIR = os.path.join(os.path.dirname(__file__), "restful_cases")


def _load_cases():
    if yaml is None:
        return []
    paths = sorted(glob.glob(os.path.join(CASE_DIR, "*.yaml")))
    docs = {p: yaml.safe_load(open(p)) for p in paths}
    paths = shard_files(paths, [len(docs[p]["cases"]) for p in paths])
    stride = smoke_stride(4)
    out = []
    for path in paths:
        for i, case in enumerate(docs[path]["cases"]):
            if i % stride:
                continue
            out.append(
                pytest.param(path, case, id=f"{os.path.basename(path)}:{case['id']}")
            )
    return out


def _resolve(resp, path: str):
    """Resolve a dotted path with [i] indexing ('table.column_key[0].ttl')."""
    cur = resp
    for part in path.split("."):
        while "[" in part:
            name, _, rest = part.partition("[")
            idx, _, part = rest.partition("]")
            if name:
                cur = cur[name]
                name = ""
            cur = cur[int(idx)]
        if part:
            cur = cur[part]
    return cur


@pytest.mark.parametrize("path,case", _load_cases())
def test_restful_case(spark, path, case):
    from openmldb_spark.engine import Engine
    from openmldb_spark.restful import ApiServer

    eng = Engine(spark)
    api = ApiServer(eng)
    for stmt in case.get("statements", []):
        eng.execute(stmt)

    resp = api.handle(case["method"], case["uri"], case.get("body"))

    exp = dict(case["expect"])
    paths = exp.pop("paths", {})
    contains = exp.pop("msg_contains", None)
    if contains is not None:
        assert contains in resp.get("msg", ""), (contains, resp)
    for k, want in exp.items():
        assert k in resp, (k, resp)
        assert resp[k] == want, (k, resp[k], want)
    for p, want in paths.items():
        got = _resolve(resp, p)
        assert got == want, (p, got, want)

    # afterAction: a follow-up SQL whose rows are asserted (insert corpus)
    after = case.get("after")
    if after:
        df = eng.execute(after["sql"])
        got = [list(r) for r in df.collect()]
        want = after["rows"]

        def norm(v):
            import datetime

            if isinstance(v, datetime.datetime):
                return int(v.replace(tzinfo=datetime.timezone.utc).timestamp() * 1000)
            if isinstance(v, datetime.date):
                return str(v)
            if isinstance(v, float):
                return round(v, 4)
            return v

        got = sorted([norm(v) for v in r] for r in got)
        want = sorted(
            [round(v, 4) if isinstance(v, float) else v for v in r] for r in want
        )
        assert got == want, (got, want)
