"""Save .explain("formatted") for every declared query to plans/<tag>/.

Usage: python tools/save_plans.py <tag> [suffix] [query ...]
e.g. python tools/save_plans.py r13 before        -> plans/r13/<q>_before.txt
     python tools/save_plans.py r13 after q1 q2   -> plans/r13/<q>_after.txt
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
from openmldb_spark.session import get_spark


def plan_of(df) -> str:
    jdf = df._jdf
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return jdf.queryExecution().explainString(mode)


def main() -> None:
    tag = sys.argv[1]
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:]
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name="save_plans")
    qs = entry.queries()
    if not names:
        names = list(qs)
    for name in names:
        try:
            plan = plan_of(qs[name](spark, sf))
        except Exception as e:  # noqa: BLE001 - record the failure in the file
            plan = f"ERROR building plan: {e}"
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        lines = plan.splitlines()
        n_ex = sum("Exchange" in l for l in lines)
        n_py = sum(
            ("BatchEvalPython" in l) or ("ArrowEvalPython" in l) or ("MapInPandas" in l)
            for l in lines
        )
        print(f"{name}: exchanges={n_ex} python_nodes={n_py} -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
