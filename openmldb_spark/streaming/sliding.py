"""Pure-streaming sliding-window features via ``applyInPandasWithState``.

SURVEY §2.8: the reference has no streaming SQL — its online engine stores
rows in tablet memory (skiplists, TTL-evicted) and computes window features
per request. This operator is the Structured-Streaming-native equivalent:
per-key state holds the (ts, value) history inside the window horizon
(state ≈ the tablet segment, TTL ≈ eviction), and every arriving event
emits its feature row computed over ``[t - range_ms, t]``.

Semantics notes:

- frames look backward only, so an event's features are exact whenever
  events of one key arrive in non-decreasing ts order across micro-batches
  (the Kafka-partition-per-key layout); a late row is still computed
  correctly against its own past, but rows emitted before it arrived do
  not retro-update (same stance as the reference's online path, where a
  request only sees rows stored before it).
- state per key is bounded: entries older than ``max_ts - range_ms`` are
  evicted on every batch (the reference's ``Gc4TTL``).
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def stream_window_agg(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    range_ms: int,
    end_ms: int = 0,
) -> DataFrame:
    """events (streaming DF) -> per-event sliding features
    (key, ts, value, w_sum, w_cnt, w_min, w_max, w_avg).

    ``ts_col`` must be epoch-ms long; the key column is cast to string.
    ``end_ms`` is the bounded upper frame end (``AND end_ms PRECEDING``):
    the frame is ``[t - range_ms, t - end_ms]`` — same semantics as the
    batch window engine's ``end_range``, so streaming features stay
    train/serve consistent with end-bounded batch windows.
    """
    out_schema = StructType(
        [
            StructField("key", StringType()),
            StructField("ts", LongType()),
            StructField("value", DoubleType()),
            StructField("w_sum", DoubleType()),
            StructField("w_cnt", LongType()),
            StructField("w_min", DoubleType()),
            StructField("w_max", DoubleType()),
            StructField("w_avg", DoubleType()),
        ]
    )
    # state = parallel arrays of the in-horizon history
    state_schema = StructType(
        [
            StructField("ts", StringType()),      # csv of longs (arrays in
            StructField("vs", StringType()),      # state cols hit arrow
        ]                                          # state-codec limits)
    )

    def fn(key, pdfs: Iterable, state: GroupState):
        import pandas as pd

        if state.exists:
            ts_s, vs_s = state.get
            hist_ts = [int(x) for x in ts_s.split(",")] if ts_s else []
            hist_vs = [float(x) for x in vs_s.split(",")] if vs_s else []
        else:
            hist_ts, hist_vs = [], []

        out_rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            for t, v in zip(pdf[ts_col], pdf[value_col]):
                t = int(t)
                v = None if pd.isna(v) else float(v)
                # insert sorted (late rows land in place)
                import bisect

                i = bisect.bisect_right(hist_ts, t)
                hist_ts.insert(i, t)
                hist_vs.insert(i, v if v is not None else float("nan"))
                lo = bisect.bisect_left(hist_ts, t - range_ms)
                hi = bisect.bisect_right(hist_ts, t - end_ms) if end_ms else i + 1
                w = [
                    x
                    for x in hist_vs[lo:hi]
                    if x == x  # NaN-safe: skip nulls
                ]
                cnt = len(w)
                s = sum(w) if w else None
                out_rows.append(
                    {
                        "key": str(key[0]),
                        "ts": t,
                        "value": v,
                        "w_sum": s,
                        "w_cnt": cnt,
                        "w_min": min(w) if w else None,
                        "w_max": max(w) if w else None,
                        "w_avg": (s / cnt) if w else None,
                    }
                )

        # evict beyond the horizon of the newest row (Gc4TTL)
        if hist_ts:
            import bisect

            cut = bisect.bisect_left(hist_ts, hist_ts[-1] - range_ms)
            hist_ts = hist_ts[cut:]
            hist_vs = hist_vs[cut:]
        state.update(
            (
                ",".join(str(x) for x in hist_ts),
                ",".join(repr(x) for x in hist_vs),
            )
        )
        if out_rows:
            yield pd.DataFrame(out_rows)

    return (
        events.groupBy(key_col)
        .applyInPandasWithState(
            fn,
            out_schema,
            state_schema,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
