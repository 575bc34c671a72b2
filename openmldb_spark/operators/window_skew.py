"""Skew-mitigated window aggregation.

Reference: ``WindowAggPlan.windowPartitionWithSkewOpt``
(``java/openmldb-batch/.../WindowAggPlan.scala:201-323``) — when one
partition key holds a disproportionate share of rows, it samples the key's
time distribution, splits the key into time buckets, *expands* the data so
each bucket also holds the preceding rows its frames need, computes windows
per (key, bucket), and keeps only each row's own-bucket output.

Spark-first re-expression:

- per-key time cut points come from ``percentile_approx`` (map-side
  combinable — no full sort of the hot key, which is exactly what we are
  trying to avoid);
- expansion is an ``explode`` of the bounded list of later buckets whose
  frames can reach the row: for a ``ROWS_RANGE r PRECEDING`` frame a row at
  ``t`` is needed by bucket ``b'`` iff ``cut(b') - r <= t`` — so each row
  is copied at most ``1 + ceil(r / bucket_span)`` times;
- the window then partitions by ``(key, bucket)`` — parallelism rises from
  #keys to #keys × #buckets with exact results.

Supports ROWS_RANGE (value-range) frames — the shape long feature windows
take — and, since r13, plain ROWS (count) frames, matching the
reference's skew opt (``WindowAggPlan.scala:201-323`` covers count
frames: the lookback is a row COUNT, so replication bounds come from
per-bucket row counts, not a time range). For a ROWS ``n PRECEDING``
frame, a row is needed by a later bucket ``b'`` iff fewer than ``n``
rows of its key lie between it and the start of ``b'``; that count is
computed from (a) the row's peer-inclusive position inside its own
bucket (a window over the SPLIT partitioning — never the hot key) and
(b) the per-(key, bucket) row counts (a tiny broadcast-sized aggregate).
Same-timestamp peers are counted as "not after" each other, so every
peer within reach replicates — a tie-order-independent over-approximation
(extra replicated rows sit more than ``n`` before every own row, so they
can never enter an own row's frame, and only own-bucket rows are kept).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openmldb_spark.operators.window import WindowDef, _ord_long, window_agg


_OWN = "__omsk_own_bucket"
_BKT = "__omsk_bucket"


def window_agg_skewed(
    df: DataFrame,
    wdef: WindowDef,
    aggs: dict,
    *,
    buckets: int = 8,
) -> DataFrame:
    """window_agg with per-key time-bucket splitting (exact results).

    ``wdef`` must be a ROWS_RANGE or plain ROWS window whose
    partition/order columns are plain column names. For ROWS frames with
    same-timestamp ties, exactness relative to ``window_agg`` holds under
    a pinned ``tiebreak`` column (the default monotonic-id tiebreak is
    plan-dependent in BOTH paths — same caveat as ``WindowDef``).
    """
    if wdef.rows_range is None and wdef.rows is None:
        raise ValueError("skew splitting supports ROWS_RANGE and ROWS windows")
    if buckets < 2:
        return window_agg(df, wdef, aggs)
    keys = [k if isinstance(k, str) else None for k in wdef.partition_by]
    if any(k is None for k in keys) or not isinstance(wdef.order_by, str):
        raise ValueError("skew splitting needs plain column names for keys/order")

    ord_col = _ord_long(df, wdef.order_by)
    work = df.withColumn("__omsk_t", ord_col)

    # per-key interior cut points (q = 1/buckets .. (buckets-1)/buckets)
    qs = [i / buckets for i in range(1, buckets)]
    cuts = work.groupBy(*keys).agg(
        F.percentile_approx("__omsk_t", qs, 10_000).alias("__omsk_cuts")
    )
    work = work.join(cuts, keys)

    # own bucket = number of cut points <= t (same-t rows share a bucket)
    own = F.size(F.filter(F.col("__omsk_cuts"), lambda c: c <= F.col("__omsk_t")))
    work = work.withColumn(_OWN, own)

    if wdef.rows_range is not None:
        r = wdef.range_ms
        # replicate to every later bucket whose frames can reach this row:
        # bucket b' (> own) starts at cuts[b'-1]; needed iff cuts[b'-1] - r <= t
        targets = F.filter(
            F.sequence(F.col(_OWN), F.lit(buckets - 1)),
            lambda b: (b == F.col(_OWN))
            | (
                F.element_at(F.col("__omsk_cuts"), b) - F.lit(r)
                <= F.col("__omsk_t")
            ),
        )
        work = work.withColumn(_BKT, F.explode(targets)).drop("__omsk_cuts")
    else:
        # ROWS n PRECEDING: the lookback is a row COUNT. A row is needed
        # by bucket b' iff (#rows of its key after it but before b''s
        # start) < n; that count = its own-bucket rows-after (computed on
        # the SPLIT (key, bucket) partitioning — never a hot-key sort)
        # plus the sizes of the whole buckets in between (a tiny
        # per-(key, bucket) count aggregate, map-side combinable).
        # EXCLUDE CURRENT_TIME widens the collected frame by
        # lookback_slack extra rows (window.py over-collect), so the
        # replication lookback widens identically.
        n_repl = wdef.rows + (
            wdef.lookback_slack if wdef.exclude_current_time else 0
        )
        cnts = work.groupBy(*keys, _OWN).agg(
            F.count(F.lit(1)).alias("__omsk_bcnt")
        )
        cnt_map = cnts.groupBy(*keys).agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col(_OWN), F.col("__omsk_bcnt")))
            ).alias("__omsk_cntmap")
        )
        work = work.join(cnt_map, keys)
        # peer-inclusive cumulative count inside the own bucket: RANGE
        # frame => same-t peers count as "not after" each other, making
        # the reach test tie-order-independent (over-replicates whole
        # peer groups at the boundary — harmless, see module docstring)
        from pyspark.sql import Window as W

        cum = F.count(F.lit(1)).over(
            W.partitionBy(*keys, _OWN)
            .orderBy("__omsk_t")
            .rangeBetween(W.unboundedPreceding, W.currentRow)
        )
        after = (
            F.coalesce(
                F.element_at(F.col("__omsk_cntmap"), F.col(_OWN)),
                F.lit(0).cast("long"),
            )
            - cum
        )
        work = work.withColumn("__omsk_after", after)

        def _between(b):
            # rows in the key's buckets strictly between own and b
            return F.when(
                b > F.col(_OWN) + 1,
                F.aggregate(
                    F.sequence(F.col(_OWN) + 1, b - 1),
                    F.lit(0).cast("long"),
                    lambda acc, j: acc
                    + F.coalesce(
                        F.element_at(F.col("__omsk_cntmap"), j),
                        F.lit(0).cast("long"),
                    ),
                ),
            ).otherwise(F.lit(0).cast("long"))

        targets = F.filter(
            F.sequence(F.col(_OWN), F.lit(buckets - 1)),
            lambda b: (b == F.col(_OWN))
            | (F.col("__omsk_after") + _between(b) < F.lit(n_repl)),
        )
        work = work.withColumn(_BKT, F.explode(targets)).drop(
            "__omsk_cuts", "__omsk_cntmap", "__omsk_after"
        )

    inner = WindowDef(
        partition_by=[*keys, _BKT],
        order_by="__omsk_t",
        rows=wdef.rows,
        rows_range=wdef.rows_range,
        open_preceding=wdef.open_preceding,
        exclude_current_row=wdef.exclude_current_row,
        exclude_current_time=wdef.exclude_current_time,
        maxsize=wdef.maxsize,
        # a bounded upper end (rows or interval) only narrows frames, so
        # the lookback replication above remains sufficient
        end_rows=wdef.end_rows,
        end_range=wdef.end_range,
        lookback_slack=wdef.lookback_slack,
        tiebreak=wdef.tiebreak,
    )
    out = window_agg(work, inner, aggs)
    return out.filter(F.col(_BKT) == F.col(_OWN)).drop(_BKT, _OWN, "__omsk_t")
