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
from openmldb_spark.operators.window import _FLAG, _RID, WindowDef, window_agg


def _numeric(dtype: str) -> bool:
    return dtype in ("tinyint", "smallint", "int", "bigint", "float", "double") or dtype.startswith(
        "decimal"
    )


def flagged_union(
    main: DataFrame,
    unions: Sequence[DataFrame],
    *,
    nullfill_cols: Sequence[str] = (),
) -> DataFrame:
    """The union-side relation every WINDOW UNION window computes over:
    main rows flagged 1, side rows flagged 0, schemas reconciled, plus the
    shared same-ts tiebreak id. Factored out of :func:`window_union` so
    SEVERAL windows over the same (partition, order, union tables) can
    share ONE union + shuffle (the fused multi-window path — request-mode
    plans put the history union under every window, and feature queries
    routinely carry many frames over one partitioning: 1d/7d/30d).

    ``nullfill_cols``: main columns a union table may legitimately lack —
    columns appended by a JOIN in the same SELECT (the reference's window
    sees the pre-join main table; test_window_union.yaml id 40).
    """
    # prune side tables to the columns the window actually consumes: the
    # aggregates' inputs are arbitrary exprs over the schema, so side tables
    # must share the main schema (reference requires matching schemas)
    # numeric-family mismatches (e.g. a subquery's `0.0` literal typing as
    # decimal(1,1) vs a stored double) coerce BOTH sides to a wide common
    # type — decimals stay poison for higher-order aggregation otherwise
    _wide = {}
    mdt0 = dict(main.dtypes)
    for u in unions:
        for c, ud in u.dtypes:
            md = mdt0.get(c)
            if md is None or md == ud:
                continue
            if {md, ud} <= {"timestamp", "timestamp_ntz", "bigint"}:
                continue
            if _numeric(md) and _numeric(ud):
                frac = any(
                    d.startswith("decimal") or d in ("float", "double") for d in (md, ud)
                )
                # widen monotonically across ALL union tables: once any side
                # is fractional the common type stays double (a later
                # integer-only union must not narrow it back to bigint)
                _wide[c] = "double" if frac or _wide.get(c) == "double" else "bigint"
    if _wide:
        main = main.select(
            *[F.col(c).cast(_wide[c]).alias(c) if c in _wide else F.col(c) for c in main.columns]
        )
    flagged = main.withColumn(_FLAG, F.lit(1))
    # main may carry ENGINE-appended columns (double-underscore names, e.g.
    # outputs of an earlier named window applied in the same SELECT) that
    # the union tables never had — NULL-fill those (and join-added columns)
    # only; a USER column missing from a union table is a schema mismatch
    # and raises, matching the reference (test_window_union.yaml ids 1-3
    # expect failure there)
    mtypes = {f.name: f.dataType for f in main.schema.fields}
    mdtypes = dict(main.dtypes)
    fillable = set(nullfill_cols)
    # a post-join main relation may carry DUPLICATE column names (t0.id and
    # t1.id both project as `id` — request mode over a LAST JOIN,
    # test_batch_request ids 2-5): by-name references are ambiguous there,
    # so match union columns POSITIONALLY (the history side flows through
    # the identical join pipeline, preserving column order)
    positional = len(set(main.columns)) != len(main.columns)
    for u in unions:
        if positional:
            # DataFrame[i] resolves by NAME internally, so positional access
            # over duplicate names is still ambiguous — rename first
            u = u.toDF(*[f"__omwu{i}" for i in range(len(u.columns))])
        ut = dict(u.dtypes)
        udts = [t for _, t in u.dtypes]
        proj = []
        for ci, c in enumerate(main.columns):
            in_u = ci < len(u.columns) if positional else c in u.columns
            md = main.dtypes[ci][1]
            mty = main.schema.fields[ci].dataType
            if in_u:
                ucol = F.col(f"__omwu{ci}") if positional else F.col(c)
                ud = udts[ci] if positional else ut[c]
                if md == ud:
                    proj.append(ucol.alias(c))
                elif {md, ud} <= {"timestamp", "timestamp_ntz", "bigint"}:
                    # dialect timestamps travel as either TIMESTAMP or
                    # int64 ms depending on the source — reconcile with an
                    # exact ms conversion toward the main table's type
                    if md == "bigint":
                        proj.append(F.unix_millis(ucol.cast("timestamp")).alias(c))
                    elif ud == "bigint":
                        proj.append(F.timestamp_millis(ucol).cast(mty).alias(c))
                    else:
                        # ntz/ltz flavor mismatch only — a direct cast is
                        # exact (timestamp_millis would fail analysis here:
                        # it expects a long input)
                        proj.append(ucol.cast(mty).alias(c))
                elif c in _wide:
                    proj.append(ucol.cast(_wide[c]).alias(c))
                else:
                    # reference rejects mismatched union column types
                    # (test_window_union.yaml id 2 expects failure)
                    raise ValueError(
                        f"WINDOW UNION table column {c!r} has type {ud}, "
                        f"main table has {md} (union table schemas must match)"
                    )
            elif c.startswith("__") or c in fillable:
                proj.append(F.lit(None).cast(mty).alias(c))
            else:
                raise ValueError(
                    f"WINDOW UNION table is missing column {c!r} of the main "
                    "table (union table schemas must match; alias columns in "
                    "a subquery to align them)"
                )
        side = u.select(*proj).withColumn(_FLAG, F.lit(0))
        # proj is built in main-column order, so positional union is exact;
        # unionByName would re-introduce the duplicate-name ambiguity
        flagged = flagged.union(side) if positional else flagged.unionByName(side)
    # same-ts tiebreak: UNION rows order BEFORE main rows (the reference's
    # request row logically arrives after same-timestamp stored history —
    # test_batch_request id 8: current time == history time), then a
    # per-side monotonic id. A struct sorts lexicographically, so this is
    # one orderable column everywhere _RID is consumed.
    return flagged.withColumn(
        _RID,
        F.struct(
            F.col(_FLAG).alias("u"), F.monotonically_increasing_id().alias("i")
        ),
    )


def window_union(
    main: DataFrame,
    unions: Sequence[DataFrame],
    wdef: WindowDef,
    aggs: dict[str, AggSpec],
    *,
    instance_not_in_window: bool = False,
    nullfill_cols: Sequence[str] = (),
) -> DataFrame:
    """Compute ``aggs`` over windows spanning main ∪ union rows; emit only
    main rows (with their original columns + aggregate columns)."""
    out = window_agg(
        flagged_union(main, unions, nullfill_cols=nullfill_cols),
        wdef,
        aggs,
        instance_not_in_window=instance_not_in_window,
        keep_flag=True,
    )
    return out.filter(F.col(_FLAG) == 1).drop(_FLAG)
