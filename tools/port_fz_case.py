"""One-shot porter: convert reference fz_sql.yaml cases into the repo's
tests/cases YAML format (type names, data-row separators, index stripping).

Usage: python tools/port_fz_case.py ID... > out.yaml
Reference: /root/reference/cases/query/fz_sql.yaml (public corpus).
"""

import sys

import yaml

REF = "/root/reference/cases/query/fz_sql.yaml"

TYPES = {
    "int": "int32",
    "bigint": "int64",
    "smallint": "int16",
    "bool": "bool",
    "float": "float",
    "double": "double",
    "string": "string",
    "date": "date",
    "timestamp": "timestamp",
    "int32": "int32",
    "int64": "int64",
}


def conv_schema(s: str) -> str:
    out = []
    for part in s.split(","):
        name, typ = part.strip().split(":")
        out.append(f"{name.strip()}:{TYPES[typ.strip()]}")
    return ", ".join(out)


def conv_rows(data: str) -> str:
    lines = []
    for line in data.strip().splitlines():
        toks = [t.strip() for t in line.split(",")]
        lines.append(", ".join(toks))
    return "\n".join(lines)


def indent(text: str, pad: str) -> str:
    return "\n".join(pad + ln for ln in text.splitlines())


def main() -> None:
    ids = {int(a) for a in sys.argv[1:]}
    doc = yaml.safe_load(open(REF))
    for case in doc["cases"]:
        if case["id"] not in ids:
            continue
        sql = case["sql"].strip().rstrip(";")
        print(f"  - id: {case['id']}")
        print(f"    desc: \"{case['desc']} (ported fz_sql.yaml id {case['id']})\"")
        print("    sql: |")
        print(indent(sql, "      "))
        print("    inputs:")
        for inp in case["inputs"]:
            # table_2/table_3 are never referenced by any fz_sql query
            if inp["name"] in ("table_2", "table_3"):
                continue
            print(f"      - name: {inp['name']}")
            print(f"        schema: {conv_schema(inp['schema'])}")
            print("        data: |")
            print(indent(conv_rows(inp["data"]), "          "))
        exp = case["expect"]
        print("    expect:")
        if "schema" in exp:
            print(f"      schema: {conv_schema(exp['schema'])}")
            print("      data: |")
            print(indent(conv_rows(exp["data"]), "        "))
        else:
            print("      success: true")
        print()


if __name__ == "__main__":
    main()
