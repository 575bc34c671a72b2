"""Scalar function surface — the reference's ~110 public scalar names mapped
to Spark SQL expressions (JVM-side, whole-stage-codegen; no Python UDFs).

Registry pinned from ``hybridse/src/udf/default_udf_library.cc`` (string
:679-1379, math :1380-1818, trig :1822-2027, logical :2028-2088, casts
:2089-2263, date/time :2264-2707) plus ``default_defs/feature_zero_def.cc``
(split family) and ``default_defs/earth_distance_def.cc``.

Use :func:`fn` to look a name up, or call the wrappers directly. Every
callable takes/returns ``pyspark.sql.Column``.
"""

from __future__ import annotations

import math
from typing import Callable, Union

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Union[Column, str]


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else (F.lit(x) if not isinstance(x, Column) else x)


# --- dialect-specific scalars that need composition ------------------------


def strcmp(a: ColumnOrName, b: ColumnOrName) -> Column:
    """(ref :955) -1/0/1 string comparison."""
    a, b = _c(a), _c(b)
    return F.when(a < b, -1).when(a > b, 1).when(a == b, 0)


def cot(x: ColumnOrName) -> Column:
    return F.cos(_c(x)) / F.sin(_c(x))


def truncate(x: ColumnOrName) -> Column:
    """(ref math :1700s) truncate toward zero, returns double for double."""
    x = _c(x)
    return F.when(x >= 0, F.floor(x)).otherwise(F.ceil(x)).cast("double")


def pmod(a: ColumnOrName, b: ColumnOrName) -> Column:
    return F.pmod(_c(a), _c(b))


def farm_fingerprint(s: ColumnOrName) -> Column:
    """hash64/farm_fingerprint (ref :1817) — deterministic 64-bit hash.
    We use xxhash64; the exact farmhash value differs from the reference
    (documented divergence — both are opaque 64-bit fingerprints)."""
    return F.xxhash64(_c(s))


def if_null(a: ColumnOrName, b: ColumnOrName) -> Column:
    return F.coalesce(_c(a), _c(b))


def nvl2(a: ColumnOrName, b: ColumnOrName, c: ColumnOrName) -> Column:
    return F.when(_c(a).isNotNull(), _c(b)).otherwise(_c(c))


def like_match(s: ColumnOrName, pattern: str, escape: str = "\\") -> Column:
    return _c(s).like(pattern, escape) if escape != "\\" else _c(s).like(pattern)


def ilike_match(s: ColumnOrName, pattern: str, escape: str = "\\") -> Column:
    return _c(s).ilike(pattern)


def degrees(x: ColumnOrName) -> Column:
    return F.degrees(_c(x))


def radians(x: ColumnOrName) -> Column:
    return F.radians(_c(x))


def earth_distance(lat1, lon1, lat2, lon2) -> Column:
    """Haversine distance in meters (ref: default_defs/earth_distance_def.cc;
    mean earth radius 6371.009 km as in the reference)."""
    lat1, lon1, lat2, lon2 = (F.radians(_c(v)) for v in (lat1, lon1, lat2, lon2))
    dlat = lat2 - lat1
    dlon = lon2 - lon1
    a = F.sin(dlat / 2) ** 2 + F.cos(lat1) * F.cos(lat2) * F.sin(dlon / 2) ** 2
    return F.lit(2 * 6371009.0) * F.asin(F.sqrt(a))


def _empty_str_array() -> Column:
    return F.expr("CAST(array() AS array<string>)")


def split(s: ColumnOrName, delim: str) -> Column:
    """feature-zero split (ref: feature_zero_def.cc:591-660): split to list.
    The reference splits on a literal delimiter (escape regex metachars);
    NULL input yields an EMPTY list (test_feature_zero_function id 6), and
    an EMPTY delimiter yields an empty list too (UpdateSplit skips when
    delimeter->size_ == 0 — test_feature_zero_function id 5)."""
    if delim == "":
        return _empty_str_array()
    return F.coalesce(F.split(_c(s), _escape_re(delim)), F.array())


def _escape_re(delim: str) -> str:
    return "".join("\\" + ch if ch in r"\.[]{}()*+?^$|" else ch for ch in delim)


def split_by_key(s: ColumnOrName, item_delim: str, kv_delim: str) -> Column:
    """split 'k1:v1,k2:v2' -> list of keys; NULL input or an empty
    delimiter -> empty list (feature_zero_def.cc UpdateSplit guard)."""
    if item_delim == "" or kv_delim == "":
        return _empty_str_array()
    return F.coalesce(F.transform(
        F.filter(
            F.split(_c(s), _escape_re(item_delim)),
            lambda kv: F.size(F.split(kv, _escape_re(kv_delim))) >= 2,
        ),
        lambda kv: F.split(kv, _escape_re(kv_delim))[0],
    ), F.array())


def split_by_value(s: ColumnOrName, item_delim: str, kv_delim: str) -> Column:
    """split 'k1:v1,k2:v2' -> list of values; NULL input or an empty
    delimiter -> empty list (feature_zero_def.cc UpdateSplit guard)."""
    if item_delim == "" or kv_delim == "":
        return _empty_str_array()
    return F.coalesce(F.transform(
        F.filter(
            F.split(_c(s), _escape_re(item_delim)),
            lambda kv: F.size(F.split(kv, _escape_re(kv_delim))) >= 2,
        ),
        lambda kv: F.split(kv, _escape_re(kv_delim))[1],
    ), F.array())


def join_(lst: ColumnOrName, delim: str) -> Column:
    return F.array_join(_c(lst), delim)


def split_array(s: ColumnOrName, delim: str) -> Column:
    """Split string to array of string by literal delimiter (ref:
    default_defs/array_def.cc:168-180) — same semantics as feature-zero
    ``split``; the reference distinguishes only the List/Array return types,
    which are both Spark arrays here."""
    return split(s, delim)


def _lit_or_col(x) -> Column:
    return F.lit(x) if isinstance(x, str) else _c(x)


def list_except_by_key(lst: ColumnOrName, except_str) -> Column:
    """Keep elements of ``lst`` ('key:value' strings) whose key is NOT in
    comma-separated ``except_str`` (ref: feature_zero_def.cc:768-784).
    The key is the piece before the first ':' (the whole element if no ':')."""
    ex = F.split(_lit_or_col(except_str), ",")
    return F.filter(
        _c(lst), lambda e: ~F.array_contains(ex, F.split(e, ":")[0])
    )


def list_except_by_value(lst: ColumnOrName, except_str) -> Column:
    """Keep elements of ``lst`` whose value is NOT in comma-separated
    ``except_str`` (ref: feature_zero_def.cc:785-801). The value is the piece
    between the first and second ':' ('' if absent — absl pair-split takes
    the first two pieces), so an empty ``except_str`` filters empty values."""
    ex = F.split(_lit_or_col(except_str), ",")
    return F.filter(
        _c(lst),
        lambda e: ~F.array_contains(ex, F.coalesce(F.split(e, ":")[1], F.lit(""))),
    )


def array_combine(delim, *arrays: ColumnOrName) -> Column:
    """Cartesian product of arrays, each product joined with ``delim``
    (ref: array_def.cc:194-230; goldens cases/query/udf_query.yaml:594-636).
    Null elements are skipped, a null delimiter acts as '', elements are
    cast to string."""
    if not arrays:
        raise ValueError("array_combine requires at least one array")
    d = F.coalesce(_lit_or_col(delim), F.lit(""))
    norm = [
        F.transform(
            F.filter(_c(a), lambda x: x.isNotNull()), lambda x: x.cast("string")
        )
        for a in arrays
    ]

    def _cross(nxt: Column):
        # closure factory: default-arg capture would raise HOF lambda arity
        def outer(x: Column) -> Column:
            return F.transform(nxt, lambda y: F.concat(x, d, y))

        return outer

    out = norm[0]
    for nxt in norm[1:]:
        out = F.flatten(F.transform(out, _cross(nxt)))
    return out


# --- registry ---------------------------------------------------------------

#: reference name -> callable(Column...) -> Column.  Aliases share entries.
REGISTRY: dict[str, Callable[..., Column]] = {
    # string (ref :679-1379)
    "concat": F.concat,
    "concat_ws": lambda sep, *cols: F.concat_ws(sep, *cols),
    "substring": lambda s, pos, length=None: F.substring(_c(s), pos, length)
    if length is not None
    else F.expr(f"substring({s}, {pos})"),
    "substr": lambda s, pos, length=None: REGISTRY["substring"](s, pos, length),
    "locate": lambda sub, s, pos=1: F.locate(sub, _c(s), pos),
    "strcmp": strcmp,
    "date_format": lambda ts, fmt: F.date_format(_c(ts), _java_fmt(fmt)),
    "like_match": like_match,
    "ilike_match": ilike_match,
    "regexp_like": lambda s, p: _c(s).rlike(p),
    "ucase": F.upper,
    "upper": F.upper,
    "lcase": F.lower,
    "lower": F.lower,
    "reverse": F.reverse,
    "char": lambda n: F.chr(_c(n)),
    "char_length": F.length,
    "character_length": F.length,
    "replace": lambda s, frm, to="": F.replace(_c(s), F.lit(frm), F.lit(to)),
    "hex": F.hex,
    "unhex": F.unhex,
    "string": lambda x: _c(x).cast("string"),
    "lpad": F.lpad,
    "rpad": F.rpad,
    "ltrim": F.ltrim,
    "rtrim": F.rtrim,
    "trim": F.trim,
    # math (ref :1380-1818)
    "log": lambda x, y=None: F.log(_c(x)) if y is None else F.log(_c(x), _c(y)),
    "ln": lambda x: F.log(_c(x)),
    "log2": F.log2,
    "log10": F.log10,
    "abs": F.abs,
    "ceil": F.ceil,
    "ceiling": F.ceil,
    "exp": F.exp,
    "floor": F.floor,
    "pow": F.pow,
    "power": F.pow,
    "round": lambda x, d=0: F.round(_c(x), d),
    "sqrt": F.sqrt,
    "truncate": truncate,
    "degrees": degrees,
    "radians": radians,
    "pmod": pmod,
    "mod": lambda a, b: _c(a) % _c(b),
    "hash64": farm_fingerprint,
    "farm_fingerprint": farm_fingerprint,
    # trig (ref :1822-2027)
    "acos": F.acos,
    "asin": F.asin,
    "atan": F.atan,
    "atan2": F.atan2,
    "cos": F.cos,
    "cot": cot,
    "sin": F.sin,
    "tan": F.tan,
    # logical (ref :2028-2088)
    "is_null": F.isnull,
    "isnull": F.isnull,
    "if_null": if_null,
    "ifnull": if_null,
    "nvl": if_null,
    "nvl2": nvl2,
    # casts (ref :2089-2263) — permissive (bad input -> NULL, ANSI off)
    "double": lambda x: _c(x).cast("double"),
    "float": lambda x: _c(x).cast("float"),
    "int": lambda x: _c(x).cast("int"),
    "int32": lambda x: _c(x).cast("int"),
    "bigint": lambda x: _c(x).cast("long"),
    "int64": lambda x: _c(x).cast("long"),
    "smallint": lambda x: _c(x).cast("short"),
    "int16": lambda x: _c(x).cast("short"),
    "bool": lambda x: _c(x).cast("boolean"),
    "date": lambda x: _c(x).cast("date"),
    # integer input = ms since epoch (dialect timestamps are int64 ms);
    # string/date parse/cast directly — mirror of sql.rewrite._t_timestamp
    "timestamp": lambda x: F.coalesce(
        F.timestamp_millis(_c(x).cast("string").try_cast("long")),
        _c(x).cast("string").try_cast("timestamp"),
    ),
    # date/time (ref :2264-2707)
    "year": F.year,
    "month": F.month,
    "day": F.dayofmonth,
    "dayofmonth": F.dayofmonth,
    "dayofweek": F.dayofweek,
    "dayofyear": F.dayofyear,
    "week": F.weekofyear,
    "weekofyear": F.weekofyear,
    "last_day": F.last_day,
    "datediff": F.datediff,
    "unix_timestamp": F.unix_timestamp,
    "from_unixtime": F.from_unixtime,
    "add_months": F.add_months,
    "hour": F.hour,
    "minute": F.minute,
    "second": F.second,
    # feature-zero / collections
    "split": split,
    "split_array": split_array,
    "split_by_key": split_by_key,
    "split_by_value": split_by_value,
    "join": join_,
    "list_except_by_key": list_except_by_key,
    "list_except_by_value": list_except_by_value,
    "array_combine": array_combine,
    "array_contains": F.array_contains,
    "array_join": F.array_join,
    "size": F.size,
    "at": F.element_at,
    "element_at": F.element_at,
    "isin": lambda x, *vals: _c(x).isin(*vals),
    "map_keys": F.map_keys,
    "get_json_object": F.get_json_object,
    "json_array_length": F.json_array_length,
    # geo
    "earth_distance": earth_distance,
}


def _java_fmt(fmt: str) -> str:
    """Translate the reference's C-style date format (strftime-like, e.g.
    '%Y-%m-%d') to Java DateTimeFormatter patterns used by Spark."""
    table = {
        "%Y": "yyyy",
        "%m": "MM",
        "%d": "dd",
        "%H": "HH",
        "%M": "mm",
        "%S": "ss",
        "%s": "ss",
    }
    out = fmt
    for k, v in table.items():
        out = out.replace(k, v)
    return out


def fn(name: str) -> Callable[..., Column]:
    """Look up a reference function by name."""
    try:
        return REGISTRY[name.lower()]
    except KeyError:
        raise KeyError(
            f"scalar function {name!r} not in registry "
            f"({len(REGISTRY)} names registered)"
        ) from None
