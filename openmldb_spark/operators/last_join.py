"""LAST JOIN — the dialect's as-of-style join: for each left row, among right
rows matching the equi-keys (+ optional extra condition), keep exactly the one
with the greatest ORDER BY value; left rows always survive (NULL fill).

Reference semantics: ``docs/en/openmldb_sql/dql/JOIN_CLAUSE.md:5-66``;
physical op ``PhysicalJoinNode`` ``hybridse/include/vm/physical_op.h:1213-1329``.
The unsorted variant ("last stored row") is storage-order-defined in the
reference; a shuffled engine has no storage order, so we require a
deterministic ``tiebreak`` column and document the divergence (the
reference's own Spark lowering does the same with dropDuplicates,
``JoinPlan.scala:200-205``).

Two Spark-first lowerings:

- **dedupe-right** (used when the join condition is keys-only): reduce the
  right side to one row per key via ``max_by(payload, (order, tiebreaks))``
  *before* the join, then a plain left join. The aggregate partial-combines
  map-side (the shuffle carries at most one candidate per key per input
  partition — a row_number window would shuffle every row and sort); the
  deduped right is usually small enough for AQE to broadcast. This is the
  100 TB path: partial-agg(right) -> shrink to |distinct keys| ->
  broadcast/SMJ.
- **post-filter** (extra non-equi condition): left join, then keep the
  max-order row per left row id. Costs a fan-out proportional to match
  multiplicity; only used when semantics demand it. A condition that
  references ONLY right columns doesn't demand it: the right side is
  pre-filtered and the dedupe-right plan used instead.
"""

from __future__ import annotations

import logging
from typing import Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

ColumnOrName = Union[Column, str]

_LID = "__omsk_left_id"


def _references_right_only(left: DataFrame, right: DataFrame, condition: Column) -> bool:
    """True iff ``condition`` analyzes against ``right`` alone and NOT
    against ``left`` alone — i.e. it unambiguously constrains only right
    columns. Bound references (``right["c"]``) fail left-side analysis by
    attribute id; an unbound name that exists on BOTH sides analyzes on
    both, returns False, and stays on the general plan (the join itself
    would flag it ambiguous)."""

    from pyspark.logger import PySparkLogger

    def _resolves(df: DataFrame) -> bool:
        # pyspark's DataFrameQueryContextLogger logs every analysis failure
        # at ERROR even when caught — this probe EXPECTS one, so mute it.
        # (PySparkLogger.getLogger, not logging.getLogger: the plain call
        # would create a vanilla Logger first and break pyspark's kwargs
        # logging with a TypeError.)
        log = PySparkLogger.getLogger("DataFrameQueryContextLogger")
        prev = log.level
        log.setLevel(logging.CRITICAL)
        try:
            df.filter(condition).schema  # analysis only, no job
            return True
        except Exception:
            return False
        finally:
            log.setLevel(prev)

    return _resolves(right) and not _resolves(left)


def last_join(
    left: DataFrame,
    right: DataFrame,
    on: Union[str, Sequence[str], Sequence[tuple[str, str]]],
    order_by: Optional[str] = None,
    *,
    condition: Optional[Column] = None,
    tiebreak: Optional[Union[str, Sequence[str]]] = None,
    right_prefix: Optional[str] = None,
) -> DataFrame:
    """LAST JOIN ``left`` to ``right``.

    on         : equi-key column name(s), or (left_col, right_col) pairs.
    order_by   : right-side ordering column (ts); max wins. None = unsorted
                 LAST JOIN -> requires ``tiebreak``.
    condition  : extra join predicate referencing both sides (forces the
                 post-filter plan).
    tiebreak   : right-side column(s) breaking order ties deterministically
                 (mandatory for unsorted; recommended when ts can tie).
    right_prefix: optionally rename right columns (prefix) to avoid clashes.
    """
    if isinstance(on, str):
        pairs = [(on, on)]
    elif on and isinstance(on[0], str):
        pairs = [(c, c) for c in on]
    else:
        pairs = list(on)

    if order_by is None and tiebreak is None:
        raise ValueError(
            "unsorted LAST JOIN needs a deterministic tiebreak column "
            "(reference picks storage order — undefined after a shuffle)"
        )
    tiebreaks = [tiebreak] if isinstance(tiebreak, str) else list(tiebreak or [])

    order_cols: list[Column] = []
    if order_by is not None:
        order_cols.append(F.col(order_by).desc_nulls_last())
    order_cols.extend(F.col(t).desc_nulls_last() for t in tiebreaks)

    if right_prefix:
        renames = {c: f"{right_prefix}{c}" for c in right.columns}
    else:
        renames = {}

    if condition is not None and _references_right_only(left, right, condition):
        # right-side-only predicate: filtering right FIRST is equivalent (a
        # right row failing the condition can never be the selected last
        # row, and left rows always survive via NULL fill either way), and
        # it unlocks the dedupe-right scale plan — no left fan-out, no
        # per-left-row window over monotonically_increasing_id. VERDICT r3
        # item 5; semantics per reference docs/en/openmldb_sql/dql/
        # JOIN_CLAUSE.md:5-11.
        right = right.filter(condition)
        condition = None

    if condition is None:
        # dedupe-right plan: one row per key before the join, via
        # max_by(payload, (order, tiebreaks)) — a hash aggregate with
        # map-side partial combine, so the shuffle carries at most one
        # candidate row per key per input partition. (Rounds 1-4 used a
        # row_number window here: that shuffles EVERY right row and sorts
        # each partition — strictly worse at scale, and its codegen took
        # ~6 executions to JIT-warm, which is what the r2→r4 last_join
        # bench drift was.) Struct comparison is field-by-field with NULL
        # smallest, so max picks exactly the row row_number(desc_nulls_last)
        # ranked first: the isNotNull flag makes any non-null order value
        # beat every null one, ties fall through to the tiebreak fields.
        ord_fields: list[Column] = []
        if order_by is not None:
            ord_fields.append(F.col(order_by).isNotNull().alias("__nn"))
            ord_fields.append(F.col(order_by).alias("__o"))
        ord_fields.extend(F.col(t).alias(f"__t{i}") for i, t in enumerate(tiebreaks))
        # keys come back from the groupBy output (so Catalyst keeps the
        # hash-partitioning on them — struct-field extraction would hide
        # it and re-shuffle the join, breaking the bucketed zero-Exchange
        # layout); only non-key columns ride in the max_by payload.
        keyset = {r for _, r in pairs}
        nonkey_idx = [i for i, c in enumerate(right.columns) if c not in keyset]
        if nonkey_idx:
            # positional __f{i} payload fields: robust to duplicate column
            # names on the right (the SQL front end's subqueries allow them)
            payload = F.struct(*[right[i].alias(f"__f{i}") for i in nonkey_idx])
            agged = right.groupBy(*[F.col(r) for _, r in pairs]).agg(
                F.max_by(payload, F.struct(*ord_fields)).alias("__omsk_s")
            )
            deduped = agged.select(
                *[
                    F.col(c) if c in keyset else F.col(f"__omsk_s.__f{i}").alias(c)
                    for i, c in enumerate(right.columns)
                ]
            )
        else:
            deduped = right.distinct()
        for old, new in renames.items():
            deduped = deduped.withColumnRenamed(old, new)
        cond = None
        for lc, rc in pairs:
            # standard equality: null-safe matching (the reference's index
            # join matches NULL keys) lives in the SQL front end only —
            # Spark rewrites <=> keys to coalesce(k, lit), which defeats
            # bucketed/co-partitioned layouts and would force an Exchange
            # on the zero-shuffle path (tests/test_bucketed.py)
            c = left[lc] == deduped[renames.get(rc, rc)]
            cond = c if cond is None else (cond & c)
        return left.join(deduped, cond, "left")

    # post-filter plan: join then keep max-order match per left row.
    # The user's condition references *original* right column names, so the
    # prefix rename happens in the final projection, after join + filter.
    lid = left.withColumn(_LID, F.monotonically_increasing_id())
    cond = condition
    for lc, rc in pairs:
        cond = cond & (lid[lc] == right[rc])
    joined = lid.join(right, cond, "left")
    order_cols = []
    if order_by is not None:
        order_cols.append(right[order_by].desc_nulls_last())
    order_cols.extend(right[t].desc_nulls_last() for t in tiebreaks)
    w = Window.partitionBy(_LID).orderBy(*order_cols)
    out = joined.withColumn("__omsk_rn", F.row_number().over(w)).filter(
        F.col("__omsk_rn") == 1
    )
    return out.select(
        *[lid[c] for c in left.columns],
        *[right[c].alias(renames.get(c, c)) for c in right.columns],
    )
