"""Token-level rewrite of dialect scalar expressions into Spark SQL text.

The reference registers ~150 scalar/aggregate names in
``hybridse/src/udf/default_udf_library.cc``; most have identical Spark SQL
spellings and pass through untouched.  The rest are renamed
(``lcase`` -> ``lower``) or expanded into equivalent Spark SQL templates
(``strcmp``, ``*_where`` in GROUP BY context, ``earth_distance``...), so the
result can be handed to ``F.expr`` / ``spark.sql`` and compiled by Catalyst —
no Python UDFs anywhere on this path.

Column-level semantics are pinned by :mod:`openmldb_spark.functions.scalar`
(same mappings as Column builders); this module is the SQL-text mirror used
by the SQL front end.
"""

from __future__ import annotations

import re

from openmldb_spark.sql.parser import Tok, render, tokenize

# ---------------------------------------------------------------------------
# simple renames: dialect name -> spark sql function name
# ---------------------------------------------------------------------------

RENAMES: dict[str, str] = {
    # string (ref default_udf_library.cc:679-1379)
    "ucase": "upper",
    "lcase": "lower",
    "char": "chr",
    "char_length": "length",
    "character_length": "length",
    # logical (ref :2028-2088)
    "is_null": "isnull",
    "if_null": "ifnull",
    "nvl": "ifnull",
    # math (ref :1380-1818) — xxhash64 as the 64-bit fingerprint (documented
    # divergence from farmhash; both opaque)
    "hash64": "xxhash64",
    "farm_fingerprint": "xxhash64",
    # casts (ref :2089-2263)
    "int32": "int",
    "int64": "bigint",
    "int16": "smallint",
    "bool": "boolean",
    # date/time (ref :2264-2707)
    "week": "weekofyear",
    # collections (ref default_defs/array_def.cc)
    "at": "element_at",
    "join": "array_join",
}

# ---------------------------------------------------------------------------
# templates: dialect call -> spark sql text built from rewritten arg texts
# ---------------------------------------------------------------------------


def _t_strcmp(a: str, b: str) -> str:
    return (
        f"(CASE WHEN ({a})<({b}) THEN -1 WHEN ({a})>({b}) THEN 1 "
        f"WHEN ({a})=({b}) THEN 0 END)"
    )


def _t_truncate(x: str) -> str:
    # truncate toward zero, double result (scalar.truncate)
    return (
        f"(CAST(CASE WHEN ({x})>=0 THEN FLOOR({x}) ELSE CEILING({x}) END AS DOUBLE))"
    )


def _t_earth_distance(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    # haversine, mean radius 6371.009 km (ref: default_defs/earth_distance_def.cc)
    r1, o1, r2, o2 = (f"RADIANS({v})" for v in (lat1, lon1, lat2, lon2))
    a = (
        f"POWER(SIN(({r2}-{r1})/2),2)"
        f"+COS({r1})*COS({r2})*POWER(SIN(({o2}-{o1})/2),2)"
    )
    return f"(2*6371009.0D*ASIN(SQRT({a})))"


def _no_escape_pattern(p: str) -> str:
    """Dialect escape '' disables escaping (backslash is literal, wildcards
    still active). Spark always treats the escape char specially, so for a
    literal pattern double the backslashes; non-literal patterns pass
    through (best effort — the corpus only uses literals here)."""
    if len(p) >= 2 and p[0] in "'\"" and p[-1] == p[0]:
        return p[0] + p[1:-1].replace("\\", "\\\\") + p[-1]
    return p


def _t_like(s: str, p: str, esc: str | None = None) -> str:
    if esc is not None and esc.strip("'\"") == "":
        return f"(({s}) LIKE ({_no_escape_pattern(p)}))"
    return f"(({s}) LIKE ({p}){' ESCAPE '+esc if esc else ''})"


def _t_ilike(s: str, p: str, esc: str | None = None) -> str:
    # Spark's ilike() function form carries the escape char (SQL `ILIKE ...
    # ESCAPE` is not in its grammar)
    if esc is None:
        return f"(({s}) ILIKE ({p}))"
    if esc.strip("'\"") == "":
        return f"(({s}) ILIKE ({_no_escape_pattern(p)}))"
    return f"ILIKE({s}, {p}, {esc})"


def _re_escape_sql_literal(lit: str) -> str:
    """Regex-escape the *contents* of a quoted SQL string literal (the
    dialect's split() delimiter is literal; Spark's split() is a regex)."""
    if len(lit) >= 2 and lit[0] in "'\"" and lit[-1] == lit[0]:
        body = lit[1:-1]
        esc = "".join("\\\\" + ch if ch in r"\.[]{}()*+?^$|" else ch for ch in body)
        return lit[0] + esc + lit[0]
    return lit


def _is_empty_str_literal(lit: str) -> bool:
    return len(lit) == 2 and lit[0] in "'\"" and lit[-1] == lit[0]


_EMPTY_STR_ARRAY = "CAST(ARRAY() AS ARRAY<STRING>)"


def _t_split(s: str, d: str) -> str:
    # dialect split of NULL yields an EMPTY list (test_feature_zero_function
    # id 6: size(split(null)) = 0), not NULL; an EMPTY delimiter yields an
    # empty list too (UpdateSplit skips when delimeter->size_ == 0,
    # feature_zero_def.cc:186 — id 5)
    if _is_empty_str_literal(d):
        return _EMPTY_STR_ARRAY
    return f"COALESCE(SPLIT({s}, {_re_escape_sql_literal(d)}), ARRAY())"


def _t_split_by_key(s: str, item_d: str, kv_d: str) -> str:
    if _is_empty_str_literal(item_d) or _is_empty_str_literal(kv_d):
        return _EMPTY_STR_ARRAY
    i, k = _re_escape_sql_literal(item_d), _re_escape_sql_literal(kv_d)
    return (
        f"COALESCE(TRANSFORM(FILTER(SPLIT({s}, {i}), kv -> SIZE(SPLIT(kv, {k})) >= 2), "
        f"kv -> SPLIT(kv, {k})[0]), ARRAY())"
    )


def _t_split_by_value(s: str, item_d: str, kv_d: str) -> str:
    if _is_empty_str_literal(item_d) or _is_empty_str_literal(kv_d):
        return _EMPTY_STR_ARRAY
    i, k = _re_escape_sql_literal(item_d), _re_escape_sql_literal(kv_d)
    return (
        f"COALESCE(TRANSFORM(FILTER(SPLIT({s}, {i}), kv -> SIZE(SPLIT(kv, {k})) >= 2), "
        f"kv -> SPLIT(kv, {k})[1]), ARRAY())"
    )


_STRFTIME = {
    "%Y": "yyyy", "%m": "MM", "%d": "dd",
    "%H": "HH", "%M": "mm", "%S": "ss", "%s": "ss",
}


def _t_list_except_by_key(lst: str, ex: str) -> str:
    # keep elements whose key (piece before first ':') not in ex split by ','
    return (
        f"FILTER({lst}, e -> NOT ARRAY_CONTAINS(SPLIT({ex}, ','), SPLIT(e, ':')[0]))"
    )


def _t_list_except_by_value(lst: str, ex: str) -> str:
    return (
        f"FILTER({lst}, e -> NOT ARRAY_CONTAINS(SPLIT({ex}, ','), "
        f"COALESCE(SPLIT(e, ':')[1], '')))"
    )


def _t_array_combine(d: str, *arrs: str) -> str:
    # cartesian product joined by d; null elements skipped, null delim = ''
    # (ref: array_def.cc:194-230)
    d2 = f"COALESCE({d}, '')"
    acc = f"TRANSFORM(FILTER({arrs[0]}, x0 -> x0 IS NOT NULL), x0 -> CAST(x0 AS STRING))"
    for i, a in enumerate(arrs[1:], 1):
        nxt = (
            f"TRANSFORM(FILTER({a}, y{i} -> y{i} IS NOT NULL), "
            f"y{i} -> CAST(y{i} AS STRING))"
        )
        acc = (
            f"FLATTEN(TRANSFORM({acc}, a{i} -> "
            f"TRANSFORM({nxt}, b{i} -> CONCAT(a{i}, {d2}, b{i}))))"
        )
    return acc


def _t_date_format(ts: str, fmt: str) -> str:
    # the reference uses C strftime patterns ('%Y-%m-%d'); Spark uses Java
    if "%" in fmt:
        for c_pat, j_pat in _STRFTIME.items():
            fmt = fmt.replace(c_pat, j_pat)
    return f"DATE_FORMAT({_ts_poly(ts)}, {fmt})"


def _ts_poly(x: str) -> str:
    """Render a timestamp-accepting argument polymorphically: integer input
    is ms since epoch (dialect timestamps are int64 ms in this engine),
    string/date/timestamp parse/cast directly — the same runtime dispatch
    as :func:`_t_timestamp`.

    Dispatch is on ``typeof`` (constant per column, folded by Catalyst), NOT
    on whether the value happens to TRY_CAST to BIGINT: a digit-only date
    string like ``'20200520'`` must follow the string arm and fail to parse
    (NULL), matching the reference — not become ``TIMESTAMP_MILLIS(20200520)``.
    Both arms go through a string round-trip so they analyze for any input
    type; exactly one is selected per column."""
    s = f"CAST(({x}) AS STRING)"
    ms = f"TRY_CAST({s} AS BIGINT)"
    return (
        f"(CASE WHEN typeof({x}) IN ('tinyint', 'smallint', 'int', 'bigint') "
        # a NEGATIVE epoch-ms input is invalid in the dialect: timestamp(-1)
        # is NULL (const_query ids 10/11), not 1969-12-31
        f"THEN TIMESTAMP_MILLIS(CASE WHEN {ms} >= 0 THEN {ms} END) "
        f"ELSE TRY_CAST({s} AS TIMESTAMP) END)"
    )


def _t_datepart(fn: str):
    # dialect date-part functions accept timestamp | date | string | int64 ms
    # (ref default_udf_library.cc:2264-2707; test_date.yaml applies them to
    # the bigint-ms c7 column)
    def t(x: str) -> str:
        return f"{fn}({_ts_poly(x)})"

    return t


def _t_timestamp(x: str) -> str:
    # dialect cast (ref default_udf_library.cc:2089-2263): an integer input
    # is ms since epoch (dialect timestamps are int64 ms in this engine);
    # string/date/timestamp inputs parse/cast directly. Spark's bare
    # CAST(bigint AS TIMESTAMP) reads seconds, so dispatch on typeof (same
    # scheme as _ts_poly — string-valued digit inputs must take the parse
    # arm and fail to NULL, per the reference).
    return _ts_poly(x)


def _t_bigint(x: str) -> str:
    # dialect cast: bigint(timestamp) is EPOCH MS (Spark's cast reads
    # seconds); every other input casts directly
    # (test_select_sample.yaml id 18)
    return (
        f"(CASE WHEN typeof({x}) IN ('timestamp', 'timestamp_ntz') "
        f"THEN UNIX_MILLIS(CAST(({x}) AS TIMESTAMP)) "
        f"ELSE CAST(({x}) AS BIGINT) END)"
    )


def _agg_where(agg: str):
    # GROUP BY-context *_where family (ref :2904-3025). The window path
    # lowers these structurally (functions.aggregates); this text form keeps
    # them available in plain aggregation SQL.
    def t(v: str, cond: str) -> str:
        return f"{agg}(CASE WHEN {cond} THEN {v} END)"

    return t


TEMPLATES: dict[str, object] = {
    # example expr udfs the reference registers by default (udaf_query /
    # fz_sql cases use them around aggregate inputs/outputs)
    "inc": lambda x: f"(({x}) + 1)",
    "identity": lambda x: f"({x})",
    "strcmp": _t_strcmp,
    "truncate": _t_truncate,
    "earth_distance": _t_earth_distance,
    "like_match": _t_like,
    "ilike_match": _t_ilike,
    "regexp_like": lambda s, p: f"(({s}) RLIKE ({p}))",
    "split": _t_split,
    "split_array": _t_split,
    "split_by_key": _t_split_by_key,
    "split_by_value": _t_split_by_value,
    "list_except_by_key": _t_list_except_by_key,
    "list_except_by_value": _t_list_except_by_value,
    "array_combine": _t_array_combine,
    "date_format": _t_date_format,
    "timestamp": _t_timestamp,
    "bigint": _t_bigint,
    "int64": _t_bigint,
    "day": _t_datepart("DAY"),
    "dayofmonth": _t_datepart("DAYOFMONTH"),
    "dayofweek": _t_datepart("DAYOFWEEK"),
    "dayofyear": _t_datepart("DAYOFYEAR"),
    "month": _t_datepart("MONTH"),
    "year": _t_datepart("YEAR"),
    "hour": _t_datepart("HOUR"),
    "minute": _t_datepart("MINUTE"),
    "second": _t_datepart("SECOND"),
    "week": _t_datepart("WEEKOFYEAR"),
    "weekofyear": _t_datepart("WEEKOFYEAR"),
    "date": lambda x: f"CAST({_ts_poly(x)} AS DATE)",
    # dialect distinct_count counts NULL as its own distinct value (ref
    # test_udaf_function id 5) — add the NULL term so the GROUP BY/scalar
    # path agrees with the window AggSpec path (aggregates.py). The
    # reference engine actually folds NULL into the type's DEFAULT value
    # (id 6): divergence documented in DIVERGENCES.md #8.
    "distinct_count": lambda x: (
        f"(COUNT(DISTINCT {x}) "
        f"+ COALESCE(MAX(CASE WHEN ({x}) IS NULL THEN 1 ELSE 0 END), 0))"
    ),
    "sum_where": _agg_where("SUM"),
    "count_where": _agg_where("COUNT"),
    "avg_where": _agg_where("AVG"),
    "min_where": _agg_where("MIN"),
    "max_where": _agg_where("MAX"),
}


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------


def _split_top_commas(tokens: list[Tok]) -> list[list[Tok]]:
    args: list[list[Tok]] = []
    cur: list[Tok] = []
    depth = 0
    for t in tokens:
        if t.text in "([":
            depth += 1
        elif t.text in ")]":
            depth -= 1
        if t.text == "," and depth == 0:
            args.append(cur)
            cur = []
        else:
            cur.append(t)
    if cur or args:
        args.append(cur)
    return args


#: numeric literal body (after stripping a trailing f/F float suffix)
_NUM_BODY_RE = re.compile(r"(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?")


# ---------------------------------------------------------------------------
# feature-signature formatters (SQL-text mirror of
# functions/feature_signature.py — same slot numbering, same Catalyst
# expressions; ref feature_signature_def.cc)
# ---------------------------------------------------------------------------

#: signature constructors -> kind tag (c=continuous, d=discrete, l=label,
#: i=gcformat index)
_SIG_FNS = {
    "continuous": "c",
    "discrete": "d",
    "binary_label": "l",
    "multiclass_label": "l",
    "regression_label": "c_l",
    "gcformat_index": "i",
}


def _sig_parse(arg_tokens: list[Tok]):
    """One formatter argument `kindfn(expr[, bucket])` ->
    (kind, value_sql, bucket) or None if not a signature call."""
    if (
        len(arg_tokens) < 4
        or arg_tokens[0].kind != "name"
        or arg_tokens[0].text.lower() not in _SIG_FNS
        or arg_tokens[1].text != "("
        or arg_tokens[-1].text != ")"
    ):
        return None
    fn = arg_tokens[0].text.lower()
    parts = [p for p in _split_top_commas(arg_tokens[2:-1]) if p]
    if not parts:
        return None
    x = rewrite_tokens(parts[0])
    if fn in ("continuous", "regression_label"):
        v = (
            f"(CASE WHEN ({x}) IS NOT NULL "
            f"THEN FORMAT_STRING('%.6f', CAST(({x}) AS DOUBLE)) END)"
        )
        return ("l" if fn == "regression_label" else "c", v, None)
    if fn == "discrete":
        bucket = None
        h = f"XXHASH64({x})"
        if len(parts) > 1:
            b = render(parts[1]).strip()
            if b.isdigit() and int(b) > 0:
                bucket = int(b)
                v = f"CAST(PMOD({h}, {bucket}) AS STRING)"
            else:
                # runtime bucket: non-positive / NULL bucket DROPS the
                # feature (value NULL; the slot is still consumed —
                # feature_signature_query id 1's golden skips slots 1-3)
                bexpr = rewrite_tokens(parts[1])
                v = (
                    f"(CASE WHEN CAST(({bexpr}) AS BIGINT) > 0 "
                    f"THEN CAST(PMOD({h}, CAST(({bexpr}) AS BIGINT)) AS STRING) END)"
                )
            return ("d", v, bucket)
        return ("d", f"CAST({h} AS STRING)", None)
    if fn == "binary_label":
        return ("l", f"CAST(CAST(CAST(({x}) AS BOOLEAN) AS INT) AS STRING)", None)
    if fn == "multiclass_label":
        return ("l", f"CAST(CAST(({x}) AS BIGINT) AS STRING)", None)
    if fn == "gcformat_index":
        return ("i", f"CAST(({x}) AS STRING)", None)
    return None


def _join_feats_sql(feats: list[str]) -> str:
    if not feats:
        return "''"
    arr = ", ".join(feats)
    return f"ARRAY_JOIN(FILTER(ARRAY({arr}), x -> x IS NOT NULL), ' ')"


def _fmt_signature_call(fname: str, inner: list[Tok]):
    """csv/gcformat/libsvm over signature args -> SQL text, or None when
    the arguments are not all signature constructors."""
    sigs = []
    for a in _split_top_commas(inner):
        if not a:
            continue
        s = _sig_parse(a)
        if s is None:
            return None
        sigs.append(s)
    if fname == "csv":
        cells = [f"COALESCE({v}, '')" for k, v, _ in sigs if k != "i"]
        return f"CONCAT_WS(',', {', '.join(cells)})" if cells else "''"
    if fname == "gcformat":
        label, index, feats, slot = "''", None, [], 1
        for k, v, _ in sigs:
            if k == "l":
                label = f"COALESCE({v}, '')"
            elif k == "i":
                index = v
            elif k == "c":
                sh = f"CAST(XXHASH64(CAST({slot} AS BIGINT)) AS STRING)"
                feats.append(
                    f"(CASE WHEN {v} IS NOT NULL "
                    f"THEN CONCAT('{slot}:', {sh}, ':', {v}) END)"
                )
                slot += 1
            elif k == "d":
                feats.append(
                    f"(CASE WHEN {v} IS NOT NULL THEN CONCAT('{slot}:', {v}) END)"
                )
                slot += 1
        idx = f"CONCAT(' ', {index})" if index is not None else "' '"
        return f"CONCAT({label}, {idx}, '| ', {_join_feats_sql(feats)})"
    if fname == "libsvm":
        label, feats, slot = None, [], 1
        for k, v, bucket in sigs:
            if k == "l":
                label = v
            elif k == "c":
                feats.append(
                    f"(CASE WHEN {v} IS NOT NULL THEN CONCAT('{slot}:', {v}) END)"
                )
                slot += 1
            elif k == "d":
                if bucket:
                    fid = f"CAST(({slot} + CAST({v} AS BIGINT)) AS STRING)"
                    feats.append(
                        f"(CASE WHEN {v} IS NOT NULL THEN CONCAT({fid}, ':1') END)"
                    )
                    slot += bucket
                else:
                    feats.append(
                        f"(CASE WHEN {v} IS NOT NULL THEN CONCAT({v}, ':1') END)"
                    )
        body = _join_feats_sql(feats)
        if label is None:
            return body
        return (
            f"(CASE WHEN {label} IS NOT NULL AND {label} != '' THEN "
            f"(CASE WHEN {body} != '' THEN CONCAT({label}, ' ', {body}) "
            f"ELSE {label} END) ELSE {body} END)"
        )
    return None


def _is_const_literal(toks: list[Tok]) -> bool:
    """True when a call-argument token slice is one bare constant literal
    (number, string, bool, or NULL)."""
    if len(toks) != 1:
        return False
    t = toks[0]
    return t.kind in ("num", "str") or (
        t.kind == "name" and t.text.lower() in ("true", "false", "null")
    )


def rewrite_tokens(tokens: list[Tok]) -> str:
    """Rewrite one expression token slice into Spark SQL text."""
    out: list[Tok] = []
    i = 0
    n = len(tokens)
    while i < n:
        t = tokens[i]
        nxt = tokens[i + 1] if i + 1 < n else None
        prev_dot = bool(out) and out[-1].text == "."
        if t.kind == "num" and t.text[-1] in "fF" and _NUM_BODY_RE.fullmatch(t.text[:-1]):
            # dialect FLOAT literal suffix: 0.0f / 1.5F / 2f
            out.append(Tok("name", f"CAST({t.text[:-1]} AS FLOAT)"))
            i += 1
            continue
        if t.kind == "num" and re.fullmatch(r"\d+[smhd]", t.text):
            # interval literals (1s/10m/2h/30d) are frame-bound syntax only
            # — the reference rejects them inside expressions
            # (fail_query: 'un-support const node' / 'interval literal
            # inside expr')
            raise ValueError(
                f"interval literal {t.text!r} is not valid in an expression"
            )
        if (
            t.kind == "name"
            and t.upper == "ESCAPE"
            and nxt is not None
            and nxt.kind == "str"
            and nxt.text.strip("'\"") == ""
            and bool(out)
            and out[-1].kind == "str"
        ):
            # dialect `LIKE pat ESCAPE ''` disables escaping; Spark rejects
            # an empty escape char — drop the clause and make the pattern's
            # backslashes literal (same rule as the like_match template)
            out[-1] = Tok("str", _no_escape_pattern(out[-1].text))
            i += 2
            continue
        if (
            t.kind == "name"
            and t.text.lower() == "xor"
            and not prev_dot
            and bool(out)
        ):
            # infix logical XOR (dialect) == '!=' on booleans, including
            # three-valued NULL behavior (test_logic.yaml id 2). Infix
            # position = something already rendered on the left. A
            # parenthesized right operand (`a xor (b)`) still renders
            # validly as `a != (b)`; Spark has no call-form xor to
            # preserve, so infix is the only live reading here.
            out.append(Tok("op", "!="))
            i += 1
            continue
        if (
            t.kind == "name"
            and t.text.lower() == "mod"
            and not prev_dot
            and bool(out)
            and (nxt is None or nxt.text != "(")
        ):
            # infix MOD (dialect) -> '%' (Spark has only the call form)
            out.append(Tok("op", "%"))
            i += 1
            continue
        if t.kind == "name" and nxt is not None and nxt.text == "(" and not prev_dot:
            # a call: find matching close paren
            depth = 0
            j = i + 1
            while j < n:
                if tokens[j].text == "(":
                    depth += 1
                elif tokens[j].text == ")":
                    depth -= 1
                    if depth == 0:
                        break
                j += 1
            if j >= n:  # unbalanced — leave as-is
                out.append(t)
                i += 1
                continue
            inner = tokens[i + 2 : j]
            # a backquoted function name (`join`(...) — the dialect quotes
            # names that collide with keywords) aliases like the bare one
            fname = t.text.lower().strip("`")
            if fname == "count" and _is_const_literal(inner):
                # the reference rejects count over a constant (count(1):
                # 'Un-support ... const' — test_udaf_table.yaml id 1);
                # count(*) is the row-count spelling
                raise ValueError("count over a constant is not supported; use count(*)")
            if fname in ("csv", "gcformat", "libsvm"):
                txt = _fmt_signature_call(fname, inner)
                if txt is not None:
                    out.append(Tok("name", txt))
                    i = j + 1
                    continue
            if fname == "cast":
                # CAST(x AS type): dialect type semantics must flow through
                # the same templates as the call forms — CAST(ms AS
                # TIMESTAMP) reads epoch MS (Spark's cast reads seconds),
                # CAST(ts AS BIGINT) yields epoch ms, etc.
                depth2, k = 0, None
                for ix, tk in enumerate(inner):
                    if tk.text in "([":
                        depth2 += 1
                    elif tk.text in ")]":
                        depth2 -= 1
                    elif depth2 == 0 and tk.upper == "AS":
                        k = ix
                ttxt = render(inner[k + 1 :]).strip().lower() if k is not None else ""
                if k is not None and ttxt in ("timestamp", "bigint", "int64", "date"):
                    arg = rewrite_tokens(inner[:k])
                    if ttxt == "date":
                        # the dialect REJECTS numeric/bool -> date
                        # (test_type.yaml id 4: cast(int as date) errors);
                        # typeof is constant per column, so the numeric arm
                        # raises at evaluation
                        txt = (
                            f"(CASE WHEN typeof({arg}) IN ('tinyint', 'smallint', "
                            f"'int', 'bigint', 'float', 'double', 'boolean') "
                            f"THEN CAST(RAISE_ERROR(CONCAT('cannot cast ', "
                            f"typeof({arg}), ' to date')) AS DATE) "
                            f"ELSE CAST({_ts_poly(arg)} AS DATE) END)"
                        )
                    else:
                        txt = TEMPLATES[ttxt](arg)
                    out.append(Tok("name", txt))
                    i = j + 1
                    continue
            if fname in TEMPLATES:
                args = [rewrite_tokens(a) for a in _split_top_commas(inner) if a]
                text = TEMPLATES[fname](*args)  # type: ignore[operator]
            else:
                sname = RENAMES.get(fname, t.text)
                text = f"{sname}({rewrite_tokens(inner)})"
            # synthetic token: render() treats it as one opaque unit, so the
            # gluing rules for '.', ',', '(' around it stay correct
            out.append(Tok("name", text))
            i = j + 1
            continue
        out.append(t)
        i += 1
    return render(out)


def rewrite_expr(tokens_or_text) -> str:
    """Expression tokens (or raw text) -> Spark SQL text."""
    toks = (
        tokenize(tokens_or_text)
        if isinstance(tokens_or_text, str)
        else list(tokens_or_text)
    )
    return rewrite_tokens(toks)
