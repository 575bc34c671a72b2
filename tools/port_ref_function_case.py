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
    if s in ("null", "NULL"):
        return "NULL"
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


def expand_providers(sql, providers):
    if not providers:
        yield "", sql
        return
    for combo in itertools.product(*providers):
        s = sql
        for i, val in enumerate(combo):
            s = s.replace(f"d[{i}]", str(val))
        suffix = "-" + "-".join(str(v).replace(" ", "_") for v in combo)
        yield suffix, s


def main():
    ref = sys.argv[1]
    only = set(sys.argv[2:])
    doc = yaml.safe_load(open(ref))
    for case in doc["cases"]:
        cid = str(case["id"])
        if only and cid not in only:
            continue
        mode = case.get("mode", "")
        if "batch-unsupport" in mode:
            continue
        inputs = case.get("inputs", [])
        names = []
        for i, inp in enumerate(inputs):
            names.append(inp.get("name") or f"t{i}")
        sql0 = case["sql"].strip().rstrip(";")
        for i, nm in enumerate(names):
            sql0 = sql0.replace("{" + str(i) + "}", nm)
        providers = case.get("dataProvider") or []
        exp = case.get("expect", {})
        for suffix, sql in expand_providers(sql0, providers):
            print(f"  - id: {cid}{suffix}")
            desc = str(case.get("desc", "")).replace('"', "'").strip()
            print(f'    desc: "{desc} (ported {ref.split("/cases/")[-1]} id {cid}{suffix})"')
            print("    sql: |")
            print(indent(sql, "      "))
            print("    inputs:")
            for nm, inp in zip(names, inputs):
                print(f"      - name: {nm}")
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
