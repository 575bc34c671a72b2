"""Port the reference's parser/plan regression corpus (``cases/plan/*.yaml``)
into this repo's statement-kind acceptance format.

The reference asserts full AST dumps (``node_tree_str``/``plan_tree_str``)
from ITS parser — meaningless against a different front end. What transfers
is the statement-surface contract: which statements parse, and what kind of
statement the parser sees. Each ported case carries:

- ``sql`` — verbatim from the reference
- ``expect: kind: <tag>``   — ``Engine.statement_kind`` must return it
  (the reference's top plan-node tag: kQuery/kInsertStmt/CMD:<type>/...)
- ``expect: accept: true``  — must classify without error (cases whose
  reference expectation has no top node tag)
- ``expect: error: true``   — must raise (the error_*.yaml suites)

Usage: python tools/port_plan_case.py <ref_yaml>... > out.yaml
Cases using the ``%%fun`` embedded-UDF DSL are skipped (stderr note):
CREATE FUNCTION is this engine's user-function surface (DIVERGENCES).
"""

from __future__ import annotations

import re
import sys

import yaml


#: (source filename, case id) -> exclusion reason. These are NOT ported:
#: the reference expectation contradicts this dialect's documented behavior.
EXCLUDED = {
    # multi-window expressions are a supported upgrade here (one-select
    # concat-join design; gate query sql_two_windows) — the reference's
    # planner rejects them
    ("error_query.yaml", "0"): "multi-window expression: supported upgrade",
    ("error_query.yaml", "1"): "multi-window expression: supported upgrade",
    # Spark executes IN (subquery), expression GROUP BY, nested array
    # literals — upgrades over the reference's planner rejections
    ("error_unsupport_sql.yaml", "in_predicate_subquery"):
        "IN (subquery): supported upgrade",
    ("error_unsupport_sql.yaml", "group_complex_expression"):
        "expression GROUP BY: supported upgrade",
    ("error_unsupport_sql.yaml", "array_1"):
        "nested array literal: supported upgrade",
    # top-level ORDER BY is not in the dialect (SELECT_STATEMENT.md lists
    # it unsupported; the plan suite only asserts the zetasql PARSE) —
    # this engine rejects it loudly instead of silently dropping the sort
    ("order_query.yaml", "1"): "top-level ORDER BY not in dialect",
    ("order_query.yaml", "2"): "top-level ORDER BY not in dialect",
    ("order_query.yaml", "3"): "top-level ORDER BY not in dialect",
    ("order_query.yaml", "4"): "top-level ORDER BY not in dialect",
    ("order_query.yaml", "5"): "top-level ORDER BY not in dialect",
    # bare UNION here contradicts union_query.yaml ids 2-4's explicit
    # success:false goldens — we follow the explicit ones
    ("sub_query.yaml", "3"): "bare UNION: contradicts union_query goldens",
}


def port_file(path: str) -> list[dict]:
    with open(path) as fh:
        data = yaml.safe_load(fh)
    is_error_suite = "error_" in path.rsplit("/", 1)[-1]
    out = []
    for c in (data or {}).get("cases", []):
        sql = (c.get("sql") or "").strip()
        if not sql:
            continue
        if "%%fun" in sql:
            print(f"# skip {path}:{c.get('id')} — %%fun DSL", file=sys.stderr)
            continue
        reason = EXCLUDED.get((path.rsplit("/", 1)[-1], str(c.get("id"))))
        if reason:
            print(f"# skip {path}:{c.get('id')} — {reason}", file=sys.stderr)
            continue
        exp = c.get("expect") or {}
        success = exp.get("success", not is_error_suite)
        nts = exp.get("node_tree_str") or ""
        m = re.search(r"\+-node\[(\w+)\]", nts)
        tag = m.group(1) if m else None
        case = {
            "id": str(c.get("id")),
            "desc": f"{c.get('desc') or ''} (ported: {path.split('cases/')[-1]} "
                    f"id {c.get('id')})".strip(),
            "sql": sql,
        }
        if not success or is_error_suite:
            case["expect"] = {"error": True}
        elif tag == "CMD":
            cm = re.search(r"\+-cmd_type: (\S+)", nts)
            case["expect"] = {"kind": f"CMD:{cm.group(1)}" if cm else "CMD"}
        elif tag:
            case["expect"] = {"kind": tag}
        else:
            case["expect"] = {"accept": True}
        out.append(case)
    return out


def main() -> None:
    cases = []
    for path in sys.argv[1:]:
        cases.extend(port_file(path))
    yaml.safe_dump({"cases": cases}, sys.stdout, allow_unicode=True,
                   sort_keys=False, width=100)


if __name__ == "__main__":
    main()
