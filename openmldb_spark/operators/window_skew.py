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
take; plain ROWS frames would need count-based lookback (use AQE for
those).
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

    ``wdef`` must be a ROWS_RANGE window (``rows_range`` set) whose
    partition/order columns are plain column names.
    """
    if wdef.rows_range is None:
        raise ValueError("skew splitting supports ROWS_RANGE windows")
    if buckets < 2:
        return window_agg(df, wdef, aggs)
    keys = [k if isinstance(k, str) else None for k in wdef.partition_by]
    if any(k is None for k in keys) or not isinstance(wdef.order_by, str):
        raise ValueError("skew splitting needs plain column names for keys/order")
    r = wdef.range_ms

    ord_col = _ord_long(df, wdef.order_by)
    work = df.withColumn("__omsk_t", ord_col)

    # per-key interior cut points (q = 1/buckets .. (buckets-1)/buckets)
    qs = [i / buckets for i in range(1, buckets)]
    cuts = work.groupBy(*keys).agg(
        F.percentile_approx("__omsk_t", qs, 10_000).alias("__omsk_cuts")
    )
    work = work.join(cuts, keys)

    # own bucket = number of cut points <= t
    own = F.size(F.filter(F.col("__omsk_cuts"), lambda c: c <= F.col("__omsk_t")))
    work = work.withColumn(_OWN, own)

    # replicate to every later bucket whose frames can reach this row:
    # bucket b' (> own) starts at cuts[b'-1]; needed iff cuts[b'-1] - r <= t
    targets = F.filter(
        F.sequence(F.col(_OWN), F.lit(buckets - 1)),
        lambda b: (b == F.col(_OWN))
        | (F.element_at(F.col("__omsk_cuts"), b) - F.lit(r) <= F.col("__omsk_t")),
    )
    work = work.withColumn(_BKT, F.explode(targets)).drop("__omsk_cuts")

    inner = WindowDef(
        partition_by=[*keys, _BKT],
        order_by="__omsk_t",
        rows_range=wdef.rows_range,
        open_preceding=wdef.open_preceding,
        exclude_current_row=wdef.exclude_current_row,
        exclude_current_time=wdef.exclude_current_time,
        maxsize=wdef.maxsize,
        # an interval upper end only narrows frames, so the r-lookback
        # replication above remains sufficient
        end_range=wdef.end_range,
        tiebreak=wdef.tiebreak,
    )
    out = window_agg(work, inner, aggs)
    return out.filter(F.col(_BKT) == F.col(_OWN)).drop(_BKT, _OWN, "__omsk_t")
