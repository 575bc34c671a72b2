"""SQL surface for the event-time streaming trio — the Spark-bonus layer
SURVEY §2.8 names (the reference has NO tumbling/session SQL constructs;
its streaming is request-mode over stored time-series, so this surface is
an extension, not parity — documented in COVERAGE §2.8).

A table registered with :meth:`Engine.register_stream` routes SELECTs
through this lowerer instead of the batch Lowerer. Supported shape::

    SELECT pk, sum(v) AS sv, count(*) AS cnt
    FROM s
    GROUP BY tumble(ts, '10s'), pk
    CONFIG (watermark='5 seconds')

- ``tumble(ts, size)`` — tumbling window of ``size``;
- ``hop(ts, slide, size)`` — hopping window (``slide`` < ``size``);
- ``session_window(ts, gap)`` (alias ``session``) — gap-merged sessions;
- interval literals take the dialect's spellings ('10s', '2m', '1d', bare
  ms) or Spark's ('10 seconds');
- other GROUP BY entries are plain key columns;
- select items are key columns, ``window_start``/``window_end`` (epoch-ms
  bigints from the underlying helpers), or sum/count/avg/min/max(col) /
  count(*) aggregates;
- ``CONFIG (watermark='...')`` sets the event-time watermark (default
  0 seconds); WHERE filters rows before the aggregation.

The result is an UNSTARTED streaming DataFrame — run it through
``writeStream`` (append mode emits finalized windows; update mode live
running values), exactly like the Python API
(:func:`openmldb_spark.streaming.eventtime.event_time_window_agg` /
:func:`session_window_agg`, which this lowerer targets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openmldb_spark.sql import parser as P
from openmldb_spark.sql.parser import Tok, render, _split_args

_WINDOW_FNS = {"tumble", "hop", "session_window", "session"}
_AGG_FNS = {"sum", "count", "avg", "min", "max"}


def _interval(tok_text: str) -> str:
    """'10s'/'2m'/bare-ms dialect spellings -> Spark duration strings;
    Spark's own '10 seconds' spellings pass through."""
    from openmldb_spark.operators.window import parse_interval_ms

    s = tok_text.strip().strip("'\"")
    if " " in s:
        return s
    return f"{parse_interval_ms(s)} milliseconds"


def _parse_window_call(toks: list[Tok]):
    """(kind, ts_col, intervals...) for a GROUP BY entry that is a window
    call; None for plain key entries."""
    if (
        len(toks) >= 3
        and toks[0].kind == "name"
        and toks[0].text.lower() in _WINDOW_FNS
        and toks[1].text == "("
        and toks[-1].text == ")"
    ):
        args = _split_args(toks[2:-1])
        kind = toks[0].text.lower()
        if kind == "session":
            kind = "session_window"
        want = 3 if kind == "hop" else 2
        if len(args) != want:
            raise ValueError(
                f"{kind} takes {want} arguments (ts, {'slide, ' if want == 3 else ''}size)"
            )
        ts = render(args[0]).strip()
        return (kind, ts, *[_interval(render(a)) for a in args[1:]])
    return None


def has_stream_window(body: "P.Select") -> bool:
    """True if any GROUP BY entry is a tumble/hop/session_window call —
    the router's batch-mode dispatch test (the event-time SQL surface
    runs over batch tables too; batch≡streaming consistency)."""
    return any(
        _parse_window_call(list(g)) is not None for g in body.group_by or []
    )


def lower_stream_select(engine, q: "P.Query") -> DataFrame:
    """Lower a SELECT over a registered stream — or, batch≡streaming, over
    a BATCH table (``F.window``/``F.session_window`` aggregate batch rows
    with identical window semantics; ``withWatermark`` is a no-op there,
    correct: a complete batch has no late data) — onto the event-time
    helpers. Raises ValueError for shapes outside the supported surface
    (the plain batch dialect stays the batch Lowerer's job)."""
    body = q.body
    if not isinstance(body, P.Select):
        raise ValueError("streaming mode supports plain SELECT only")
    if body.joins or body.windows or body.having is not None or body.limit is not None:
        raise ValueError(
            "streaming SELECT supports WHERE + GROUP BY "
            "tumble/hop/session_window only (no joins/OVER/HAVING/LIMIT)"
        )
    loc = engine._stream_loc(body.from_.name)
    if loc in engine._streams:
        stream = engine._streams[loc]
    else:
        try:
            stream = engine._table_view()[body.from_.name]
        except KeyError:
            raise ValueError(f"unknown table {body.from_.name!r}") from None
    if body.where is not None:
        from openmldb_spark.sql.rewrite import rewrite_expr

        stream = stream.filter(F.expr(rewrite_expr(body.where)))

    win = None
    keys: list[str] = []
    for g in body.group_by or []:
        call = _parse_window_call(list(g))
        if call is not None:
            if win is not None:
                raise ValueError("one window call per GROUP BY")
            win = call
            continue
        names = [t.text for t in g if t.kind == "name"]
        if len(names) != 1 or len(list(g)) != 1:
            raise ValueError(f"GROUP BY key must be a plain column: {render(list(g))}")
        keys.append(names[0])
    if win is None:
        raise ValueError(
            "streaming GROUP BY needs tumble(ts, size) / hop(ts, slide, "
            "size) / session_window(ts, gap)"
        )

    from openmldb_spark.sql.lowering import _derived_name

    passthrough = set(keys) | {"window_start", "window_end"}
    aggs: dict = {}
    out_cols: list = []  # (source column name, output name) pairs
    for it in body.items:
        if it.star:
            raise ValueError("streaming SELECT needs explicit items")
        toks = list(it.expr)
        name = it.alias or _derived_name(toks)
        if len(toks) == 1 and toks[0].kind == "name":
            if toks[0].text not in passthrough:
                raise ValueError(
                    f"non-aggregate item {toks[0].text!r} must be a GROUP "
                    f"BY key or window_start/window_end"
                )
            out_cols.append((toks[0].text, name))
            continue
        if (
            len(toks) >= 3
            and toks[0].kind == "name"
            and toks[0].text.lower() in _AGG_FNS
            and toks[1].text == "("
            and toks[-1].text == ")"
        ):
            from openmldb_spark.sql.rewrite import rewrite_expr

            fn = toks[0].text.lower()
            arg_toks = toks[2:-1]
            if fn == "count" and render(arg_toks).strip() in ("*", "1"):
                aggs[name] = F.count(F.lit(1))
            else:
                # F.expr, not F.col: the argument may be an expression
                # (sum(v * 2), avg(abs(v))) — r9 review finding
                aggs[name] = getattr(F, fn)(F.expr(rewrite_expr(arg_toks)))
            out_cols.append((name, name))
            continue
        raise ValueError(
            f"unsupported streaming select item: {render(toks)} "
            f"(sum/count/avg/min/max over a column, a GROUP BY key, or "
            f"window_start/window_end)"
        )
    if not aggs:
        raise ValueError("streaming SELECT needs at least one aggregate")

    from openmldb_spark.streaming.eventtime import (
        event_time_window_agg,
        session_window_agg,
    )

    watermark = body.config.get("watermark", "0 seconds")
    kind, ts = win[0], win[1]
    if kind == "session_window":
        out = session_window_agg(
            stream, ts_col=ts, gap=win[2], aggs=aggs, keys=keys,
            watermark=watermark,
        )
    elif kind == "hop":
        out = event_time_window_agg(
            stream, ts_col=ts, window=win[3], slide=win[2], aggs=aggs,
            keys=keys, watermark=watermark,
        )
    else:
        out = event_time_window_agg(
            stream, ts_col=ts, window=win[2], aggs=aggs, keys=keys,
            watermark=watermark,
        )
    # column references, not selectExpr: an unaliased aggregate's derived
    # name ('sum(v)') would re-PARSE as a new aggregate over the windowed
    # output (r9 review finding) — backticks make it a plain reference
    return out.select(*[F.col(f"`{src}`").alias(dst) for src, dst in out_cols])
