"""WINDOW ... UNION — window frames drawn from main ∪ side tables, output
rows only for main-table rows.

Reference semantics: ``docs/en/openmldb_sql/dql/WINDOW_CLAUSE.md:219-260``;
the reference's own Spark lowering uses exactly this flag-column pattern
(``WindowAggPlanUtil.windowUnionTables``, ``WindowAggPlanUtil.scala:50-155``:
literal 1 for main rows, 0 for union rows, unionByName, window, filter).

``INSTANCE_NOT_IN_WINDOW`` (``physical_op.h:1166-1168``): main-table rows
other than the current row are excluded from every frame — frames see union
rows + the current row only.

Scale: the union is a narrow transform (no shuffle); the single shuffle is
the window's partitioning, shared across all aggregates. Side tables are
projected to the window's needed columns before the union (column pruning
keeps the shuffle payload minimal).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openmldb_spark.functions.aggregates import AggSpec
from openmldb_spark.operators.window import _FLAG, WindowDef, window_agg


def window_union(
    main: DataFrame,
    unions: Sequence[DataFrame],
    wdef: WindowDef,
    aggs: dict[str, AggSpec],
    *,
    instance_not_in_window: bool = False,
) -> DataFrame:
    """Compute ``aggs`` over windows spanning main ∪ union rows; emit only
    main rows (with their original columns + aggregate columns)."""
    # prune side tables to the columns the window actually consumes: the
    # aggregates' inputs are arbitrary exprs over the schema, so side tables
    # must share the main schema (reference requires matching schemas)
    flagged = main.withColumn(_FLAG, F.lit(1))
    # main may carry ENGINE-appended columns (double-underscore names, e.g.
    # outputs of an earlier named window applied in the same SELECT) that
    # the union tables never had — NULL-fill those and only those; a USER
    # column missing from a union table is a schema mismatch and raises,
    # matching the reference (test_window_union.yaml ids 1-3 expect
    # failure there)
    mtypes = {f.name: f.dataType for f in main.schema.fields}
    for u in unions:
        proj = []
        for c in main.columns:
            if c in u.columns:
                proj.append(F.col(c))
            elif c.startswith("__"):
                proj.append(F.lit(None).cast(mtypes[c]).alias(c))
            else:
                raise ValueError(
                    f"WINDOW UNION table is missing column {c!r} of the main "
                    "table (union table schemas must match; alias columns in "
                    "a subquery to align them)"
                )
        flagged = flagged.unionByName(u.select(*proj).withColumn(_FLAG, F.lit(0)))
    out = window_agg(
        flagged,
        wdef,
        aggs,
        instance_not_in_window=instance_not_in_window,
        keep_flag=True,
    )
    return out.filter(F.col(_FLAG) == 1).drop(_FLAG)
