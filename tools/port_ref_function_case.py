"""General porter for the reference's function-style case YAML
(``/root/reference/cases/function/**``: columns/rows lists, ``{0}`` table
placeholders, ``dataProvider`` cross-product substitution ``d[i]``) into
this repo's tests/cases format (schema/data strings).

Usage:
    python tools/port_ref_function_case.py REF_FILE [id ...] > out.yaml

- every dataProvider combination becomes its own emitted case
  (id suffixed ``-dN``); cases whose golden depends on the variant are the
  reference's responsibility (it asserts one golden for all variants).
- ``mode: batch-unsupport`` cases are skipped (their goldens come from
  request mode); ``request-unsupport`` ones are kept (this engine checks
  batch).
- ``expect.success: false`` -> ``expect.error: true`` (negative case).
"""

import itertools
import re
import sys

import yaml

TYPES = {
    "int": "int32",
    "int32": "int32",
    "bigint": "int64",
    "int64": "int64",
    "smallint": "int16",
    "int16": "int16",
    "bool": "bool",
    "float": "float",
    "double": "double",
    "string": "string",
    "date": "date",
    "timestamp": "timestamp",
}


def conv_cols(cols):
    out = []
    for c in cols:
        if ":" in c and " " not in c.strip():
            # query-corpus colon style ("col1:int32")
            name, typ = c.rsplit(":", 1)
        else:
            name, typ = c.rsplit(None, 1)
        out.append(f"{name.strip()}:{TYPES[typ.strip()]}")
    return ", ".join(out)


def fmt_val(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return repr(v)
    s = str(v)
    # NOTE: a YAML-quoted "null" is a REAL string value (the out_in corpus
    # round-trips it on purpose); only Python None (unquoted null) is NULL
    if s == "":
        return '""'
    return s


def conv_rows(rows):
    lines = []
    for r in rows:
        toks = [fmt_val(v) for v in r]
        assert not any(", " in t for t in toks), f"value contains ', ': {r}"
        lines.append(", ".join(toks))
    return "\n".join(lines)


def conv_data_str(data):
    # reference ", "-ish rows with free-form spacing -> exact ", " separators
    lines = []
    for ln in str(data).strip().splitlines():
        lines.append(", ".join(t.strip() for t in ln.split(",")))
    return "\n".join(lines)


def indent(text, pad):
    return "\n".join(pad + ln for ln in text.splitlines())


def _sanitize(v):
    s = str(v)
    for a, b in (("{0}.", "t0_"), ("{1}.", "t1_"), ("{2}.", "t2_"), (" ", "_"),
                 ("!", "not"), ("(", ""), (")", ""), (",", "_"), ("'", ""),
                 ("%", "pct"), ("*", "star"), ("/", "div"), ("+", "plus"),
                 ("-", "minus"), ("<", "lt"), (">", "gt"), ("=", "eq")):
        s = s.replace(a, b)
    return s


def expand_providers(sql, providers):
    """Yield (suffix, sql, first_dim_index) per provider combination."""
    if not providers:
        yield "", sql, None
        return
    for combo in itertools.product(*providers):
        s = sql
        for i, val in enumerate(combo):
            s = s.replace(f"d[{i}]", str(val))
        suffix = "-" + "-".join(_sanitize(v) for v in combo)
        yield suffix, s, providers[0].index(combo[0])


def main():
    global _REF
    _REF = ref = sys.argv[1]
    only = set(sys.argv[2:])
    doc = yaml.safe_load(open(ref))
    seen: dict = {}
    for case in doc["cases"]:
        cid = str(case["id"])
        seen[cid] = seen.get(cid, 0) + 1
        if seen[cid] > 1:  # the reference reuses ids — disambiguate
            cid = f"{cid}~{seen[cid]}"
        if only and cid not in only:
            continue
        mode = case.get("mode", "")
        if "batch-unsupport" in mode:
            continue
        import contextlib
        import io

        buf = io.StringIO()
        try:
            with contextlib.redirect_stdout(buf):
                _emit_case(case, cid)
            print(buf.getvalue(), end="")
        except Exception as ex:  # malformed spec — skip, keep going
            print(f"SKIP {cid}: {type(ex).__name__}: {ex}", file=sys.stderr)


def _emit_case(case, cid):
    if True:
        inputs = case.get("inputs", [])
        names = []
        for i, inp in enumerate(inputs):
            names.append(inp.get("name") or f"t{i}")
        providers = case.get("dataProvider") or []
        exp_base = case.get("expect", {})
        exp_provider = case.get("expectProvider") or {}
        for suffix, sql, d0 in expand_providers(case["sql"].strip().rstrip(";"), providers):
            # table placeholders substitute AFTER provider expansion —
            # provider values may themselves contain {N} references
            for i, nm in enumerate(names):
                sql = sql.replace("{" + str(i) + "}", nm)
            sql = sql.rstrip().rstrip(";")
            exp = dict(exp_base)
            if d0 is not None and d0 in exp_provider:
                exp.update(exp_provider[d0])
            print(f"  - id: {cid}{suffix}")
            desc = str(case.get("desc", "")).replace('"', "'").strip()
            print(f'    desc: "{desc} (ported {_REF.split("/cases/")[-1]} id {cid}{suffix})"')
            print("    sql: |")
            print(indent(sql, "      "))
            print("    inputs:")
            for nm, inp in zip(names, inputs):
                print(f"      - name: {nm}")
                if "schema" in inp:  # already name:type string form
                    schema = ", ".join(
                        f"{p.split(':')[0].strip()}:{TYPES[p.split(':')[1].strip()]}"
                        for p in inp["schema"].split(",")
                    )
                    print(f"        schema: {schema}")
                else:
                    print(f"        schema: {conv_cols(inp['columns'])}")
                rows = inp.get("rows") or []
                if rows:
                    print("        data: |")
                    print(indent(conv_rows(rows), "          "))
                elif inp.get("data"):
                    print("        data: |")
                    print(indent(conv_data_str(inp["data"]), "          "))
                else:
                    print("        data: \"\"")
            print("    expect:")
            if exp.get("success") is False:
                print("      error: true")
            elif "count" in exp and "rows" not in exp and "data" not in exp:
                # LIMIT-style count-only expect
                print(f"      rowcount: {exp['count']}")
            elif list(exp.keys()) == ["success"]:
                # success-only reference expect: run-without-error assert
                print("      success: true")
            elif "schema" in exp:  # name:type string form
                schema = ", ".join(
                    f"{p.split(':')[0].strip()}:{TYPES[p.split(':')[1].strip()]}"
                    for p in exp["schema"].split(",")
                )
                print(f"      schema: {schema}")
                if exp.get("order"):
                    print(f"      order: {exp['order']}")
                print("      data: |")
                print(indent(conv_data_str(exp.get("data", "")), "        "))
            else:
                print(f"      schema: {conv_cols(exp['columns'])}")
                if exp.get("order"):
                    print(f"      order: {exp['order']}")
                if exp.get("rows"):
                    print("      data: |")
                    print(indent(conv_rows(exp["rows"]), "        "))
                elif exp.get("data"):
                    print("      data: |")
                    print(indent(conv_data_str(exp["data"]), "        "))
                else:
                    print("      data: \"\"")
            print()


if __name__ == "__main__":
    main()
