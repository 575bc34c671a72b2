"""YAML golden-case harness — the reference's test methodology (SURVEY §5:
``cases/query/*.yaml``, loader ``hybridse/include/case/sql_case.h:33-191``)
re-implemented for this engine: each case = SQL + inline inputs + expected
rows, executed through the SQL front end.

Format: ``schema`` is ``name:type`` (types bool/int16/int32/int64/float/
double/string/date/timestamp; timestamp = int64 ms), ``data`` rows are
", "-separated, NULL spelled NULL. Cases under tests/cases/ are original to
this repo (same shape as the reference corpus, goldens hand-computed).
"""

import glob
import math
import os

import pytest

try:
    import yaml
except ImportError:  # minimal fallback parser not worth it — require pyyaml
    yaml = None

CASE_DIR = os.path.join(os.path.dirname(__file__), "cases")

_SPARK_TYPES = {
    "bool": "boolean",
    "int16": "short",
    "int32": "int",
    "int": "int",
    "int64": "long",
    "bigint": "long",
    "float": "float",
    "double": "double",
    "string": "string",
    "date": "date",
    "timestamp": "long",  # reference convention: ms since epoch
}


def _parse_schema(s: str) -> list[tuple[str, str]]:
    cols = []
    for part in s.split(","):
        name, typ = part.strip().split(":")
        cols.append((name.strip(), typ.strip()))
    return cols


def _parse_value(tok: str, typ: str):
    tok = tok.strip()
    if tok == "NULL" or tok == "":
        return None
    if tok in ('""', "''"):  # explicit empty string (NULL is the bare cell)
        return ""
    if typ in ("int16", "int32", "int64", "int", "bigint", "timestamp"):
        return int(tok)
    if typ in ("float", "double"):
        return float(tok)
    if typ == "bool":
        return tok.lower() == "true"
    if typ == "date":
        import datetime

        return datetime.date.fromisoformat(tok)
    return tok


def _parse_rows(data: str, schema: list[tuple[str, str]]):
    rows = []
    for line in data.strip().splitlines():
        toks = line.split(", ")
        assert len(toks) == len(schema), f"row/schema arity: {line!r}"
        rows.append(tuple(_parse_value(t, typ) for t, (_, typ) in zip(toks, schema)))
    return rows


def smoke_stride(default_stride: int) -> int:
    """r14 test-gate budget (VERDICT r13 item 1): the full ported-case
    corpus is ~2,400 Spark-bound tests and the complete suite (~59 min
    wall) no longer fits the driver's verify window, so the DEFAULT run
    keeps a deterministic smoke subset — every ``default_stride``-th case
    of each yaml file, always including the file's first case (selection
    by stable in-file position, never random). ``SPARK_GRAFT_FULL_TESTS=1``
    restores the complete corpus (builders run it before declaring a round
    done), and an explicit ``SPARK_GRAFT_YAML_SHARD`` spec implies the
    full set within the shard."""
    if os.environ.get("SPARK_GRAFT_FULL_TESTS") or os.environ.get(
        "SPARK_GRAFT_YAML_SHARD"
    ):
        return 1
    return default_stride


def shard_files(paths: list[str], counts: list[int]) -> list[str]:
    """Deterministic shard selection: ``SPARK_GRAFT_YAML_SHARD=i/n`` keeps
    roughly 1/n of the cases (greedy balance by per-file case count, so each
    shard stays under the ~8-minute observability window — the full corpus
    exceeds a single 10-minute run). Unset = all files."""
    spec = os.environ.get("SPARK_GRAFT_YAML_SHARD")
    if not spec:
        return paths
    idx, _, n = spec.partition("/")
    idx, n = int(idx), int(n)
    loads = [0] * n
    assign: dict[str, int] = {}
    for c, p in sorted(zip(counts, paths), key=lambda t: (-t[0], t[1])):
        s = min(range(n), key=lambda i: loads[i])
        loads[s] += c
        assign[p] = s
    return [p for p in paths if assign[p] == idx]


def _load_cases():
    if yaml is None:
        return []
    paths = sorted(glob.glob(os.path.join(CASE_DIR, "*.yaml")))
    docs = {p: yaml.safe_load(open(p)) for p in paths}
    paths = shard_files(paths, [len(docs[p]["cases"]) for p in paths])
    stride = smoke_stride(10)
    out = []
    for path in paths:
        for i, case in enumerate(docs[path]["cases"]):
            if i % stride:
                continue
            out.append(pytest.param(path, case, id=f"{os.path.basename(path)}:{case['id']}"))
    return out


def _build_df(spark, inp):
    schema = _parse_schema(inp["schema"])
    ddl = ", ".join(f"`{n}` {_SPARK_TYPES[t]}" for n, t in schema)
    return spark.createDataFrame(_parse_rows(inp["data"], schema), ddl)


def _eq(a, b, typ):
    if a is None or b is None:
        return a is None and b is None
    if typ in ("float", "double"):
        if math.isnan(a) or math.isnan(b):
            return math.isnan(a) and math.isnan(b)
        return math.isclose(a, b, rel_tol=1e-6, abs_tol=1e-9)
    if typ == "timestamp":
        # timestamps travel as int64 ms, but an explicit timestamp() cast in
        # a query yields a real TIMESTAMP column (naive UTC wall-clock under
        # the pinned session tz) — normalize to ms for comparison
        import calendar
        import datetime

        if isinstance(a, datetime.datetime):
            a = calendar.timegm(a.timetuple()) * 1000 + a.microsecond // 1000
        if isinstance(b, datetime.datetime):
            b = calendar.timegm(b.timetuple()) * 1000 + b.microsecond // 1000
    return a == b


def _parse_parameters(p):
    """Reference `parameters:` block ({columns: ['p1 int', ...], rows:
    [[...]]}) -> a positional value list for `?` binding (single row)."""
    types = [c.strip().rsplit(None, 1)[1] for c in p["columns"]]
    row = p["rows"][0]
    return [None if v is None else _parse_value(str(v), t) for v, t in zip(row, types)]


@pytest.mark.parametrize("path,case", _load_cases())
def test_yaml_case(spark, path, case):
    from openmldb_spark.sql import sql

    tables = {inp["name"]: _build_df(spark, inp) for inp in case.get("inputs", [])}
    params = _parse_parameters(case["parameters"]) if "parameters" in case else None
    exp = case["expect"]
    if exp.get("error"):
        # negative case (reference `expect: success: false`): the query
        # must be rejected at plan/analysis time or fail on execution
        with pytest.raises(Exception):
            sql(spark, case["sql"], tables, parameters=params).collect()
        return
    got_df = sql(spark, case["sql"], tables, parameters=params)
    if exp.get("success") is True:
        # success-only reference expect: the query must plan and execute
        got_df.collect()
        return
    if "rowcount" in exp:
        # count-only assertion: for constructs whose row CHOICE is
        # storage-order-defined in the reference (LIMIT N < matching rows)
        # and nondeterministic on Spark
        if "schema" in exp:
            assert got_df.columns == [n for n, _ in _parse_schema(exp["schema"])]
        assert got_df.count() == exp["rowcount"]
        return
    exp_schema = _parse_schema(exp["schema"])
    exp_rows = _parse_rows(exp["data"], exp_schema)

    assert got_df.columns == [n for n, _ in exp_schema], (
        f"columns {got_df.columns} != {[n for n, _ in exp_schema]}"
    )
    order_col = exp.get("order")
    got = [tuple(r) for r in got_df.collect()]
    if order_col:
        idx = [n for n, _ in exp_schema].index(order_col)
        got.sort(key=lambda r: (r[idx] is None, r[idx]))
        exp_rows.sort(key=lambda r: (r[idx] is None, r[idx]))
    assert len(got) == len(exp_rows), f"{len(got)} rows != {len(exp_rows)}"
    for g, e in zip(got, exp_rows):
        for gv, ev, (name, typ) in zip(g, e, exp_schema):
            assert _eq(gv, ev, typ), (
                f"case {case['id']} ({case['desc']}): column {name}: {gv!r} != {ev!r}\n"
                f"got row: {g}\nexp row: {e}"
            )
