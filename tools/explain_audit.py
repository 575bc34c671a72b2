"""Plan audit: print (and grep) the physical plans of the headline queries.

Usage: python tools/explain_audit.py [sf_dir] [query ...]

For each query prints a compact summary — #exchanges (shuffles), #sorts,
whether the parquet scan shows pushed filters and a pruned read schema —
then the formatted plan. The checks encode the review points from the
scale design notes (filters reach the scan, projections prune columns,
no gratuitous shuffles).
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
    args = sys.argv[1:]
    sf = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    names = [a for a in args if not os.path.isdir(a)]
    spark = get_spark(app_name="explain_audit", cpus=8)
    qs = entry.queries()
    if not names:
        names = ["scan_project_filter", "group_agg", "window_rows_range",
                 "last_join", "window_union", "sql_window", "long_window_preagg"]
    for name in names:
        plan = plan_of(qs[name](spark, sf))
        lines = plan.splitlines()
        n_ex = sum("Exchange" in l for l in lines)
        n_sort = sum(l.strip().startswith(("Sort", "* Sort")) for l in lines)
        pushed = [l.strip() for l in lines if "PushedFilters" in l]
        schemas = [l.strip() for l in lines if "ReadSchema" in l]
        print(f"==== {name}: exchanges={n_ex} sorts={n_sort}")
        for l in pushed[:3]:
            print("  ", l[:160])
        for l in schemas[:3]:
            print("  ", l[:160])
        if "-v" in sys.argv:
            print(plan)
    spark.stop()


if __name__ == "__main__":
    main()
