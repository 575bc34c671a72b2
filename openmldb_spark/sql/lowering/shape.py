"""Statement-shape classification + small token utilities shared by the
lowering executor: text-path vs structural-path routing
(``_needs_structural_group``), qualifier disambiguation, NULL-safe
struct join equality, and derived-column naming — split out of the
former single-module ``sql/lowering.py`` (r9). The public import
surface is ``openmldb_spark/sql/lowering/__init__.py``.
"""

from __future__ import annotations


from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from openmldb_spark.sql.parser import Select, Tok, render
from openmldb_spark.sql.rewrite import rewrite_expr

from openmldb_spark.sql.lowering.aggs import (  # noqa: F401
    _AGGS,
    _TEXT_GROUP_AGGS,
)


def _needs_structural_group(sel: Select) -> bool:
    if not sel.group_by:
        return False

    def scan(tokens: list[Tok]) -> bool:
        for i, t in enumerate(tokens):
            if (
                t.kind == "name"
                and t.text.lower().strip("`") in _AGGS
                and t.text.lower().strip("`") not in _TEXT_GROUP_AGGS
                and i + 1 < len(tokens)
                and tokens[i + 1].text == "("
                and not (i > 0 and tokens[i - 1].text == ".")
            ):
                return True
        return False

    return any(not it.star and scan(it.expr) for it in sel.items) or (
        sel.having is not None and scan(sel.having)
    )


def _ambiguous_qualifiers(
    sources: list,
) -> dict[str, str]:
    """Map each column name appearing on MORE THAN ONE join input to the
    left-most input's alias (only when that alias exists to qualify with)."""
    seen: dict[str, tuple[Optional[str], int]] = {}
    counts: dict[str, int] = {}
    for alias, cols in sources:
        for c in cols:
            counts[c] = counts.get(c, 0) + 1
            if c not in seen:
                seen[c] = (alias, 0)
    return {
        c: alias
        for c, (alias, _) in seen.items()
        if counts[c] > 1 and alias
    }


def _qualify_bare(tokens: list[Tok], qual: dict[str, str]) -> list[Tok]:
    """Prefix ambiguous bare column names with their left-most table alias.
    A name is bare when not preceded/followed by '.' and not a call head."""
    out: list[Tok] = []
    n = len(tokens)
    for i, t in enumerate(tokens):
        prev_dot = bool(out) and out[-1].text == "."
        nxt = tokens[i + 1] if i + 1 < n else None
        if (
            t.kind == "name"
            and t.text in qual
            and not prev_dot
            and (nxt is None or nxt.text not in (".", "("))
        ):
            out.append(Tok("name", qual[t.text]))
            out.append(Tok("op", "."))
        out.append(t)
    return out


def _struct_eq(
    equi_pairs: list, ralias: str, left: DataFrame, dd: DataFrame
) -> Optional[Column]:
    """Null-safe equi condition as ONE struct-equality key: the dialect's
    index join matches NULL keys (test_lastjoin_simple.yaml id 19), and
    Spark's struct comparison is null-safe per field while still planning
    as a single-key hash join — unlike `<=>`, which rewrites every key to
    a (coalesce, isnull) pair and doubled the probe-side key width (2x
    wall on the sql_last_join bench).

    Returns ``None`` when a key pair's types cannot be reconciled exactly
    (e.g. string vs numeric): the caller falls back to the generic
    ``F.expr`` ON condition, where Spark's own implicit coercion applies —
    forcing double there would turn unparseable strings into NULL keys that
    the null-safe struct equality would then silently MATCH."""
    ltypes = dict(left.dtypes)
    rtypes = dict(dd.dtypes)
    _INTS = ("tinyint", "smallint", "int", "bigint")
    _TSD = ("timestamp", "timestamp_ntz", "date")

    def _num(t: str) -> bool:
        return t in _INTS or t in ("float", "double") or t.startswith("decimal")

    def reconcile(le: Column, re_: Column, lt: str, rt: str):
        """Exactly reconcile one key pair, or None if not safely possible."""
        if lt == rt:
            return le, re_
        if lt in _INTS and rt in _INTS:
            return le.cast("bigint"), re_.cast("bigint")
        if _num(lt) and _num(rt):
            return le.cast("double"), re_.cast("double")
        if lt in _TSD and rt in _TSD:
            # date vs timestamp / ntz vs ltz: cast both to timestamp
            # (Spark's own implicit coercion for the comparison)
            return le.cast("timestamp"), re_.cast("timestamp")
        # dialect timestamps travel as int64 ms: reconcile timestamp-family
        # vs bigint via an exact ms conversion, never a double cast
        # (timestamp seconds vs ms would otherwise never be equal)
        if lt in _TSD and rt == "bigint":
            return F.unix_millis(le.cast("timestamp")), re_
        if lt == "bigint" and rt in _TSD:
            return le, F.unix_millis(re_.cast("timestamp"))
        return None

    lefts, rights = [], []
    for ltoks, rc in equi_pairs:
        le = F.expr(rewrite_expr(ltoks))
        # qualified-name refs, not frame refs: the same base table may be
        # LAST JOINed twice under different aliases (fz_sql id 3), where
        # frame refs trip Spark's ambiguous-self-join detection
        re_ = F.col(f"{ralias}.{rc}")
        lt = ltypes.get(render(ltoks).strip())
        if lt is None:
            # non-column left expr: probe its dtype
            lt = left.select(le.alias("__t")).dtypes[0][1]
        pair = reconcile(le, re_, lt, rtypes[rc])
        if pair is None:
            return None
        lefts.append(pair[0])
        rights.append(pair[1])
    return F.struct(*lefts) == F.struct(*rights)



def _dequalify(tokens: list[Tok], columns: list[str]) -> list[Tok]:
    """Strip `alias.` qualifiers when the bare column name is unambiguous
    in ``columns``; raise if the join output has duplicate names."""
    out: list[Tok] = []
    i = 0
    n = len(tokens)
    while i < n:
        t = tokens[i]
        if (
            t.kind == "name"
            and i + 2 < n
            and tokens[i + 1].text == "."
            and tokens[i + 2].kind == "name"
        ):
            col = tokens[i + 2].text
            if columns.count(col) > 1:
                raise ValueError(
                    f"column {col!r} is ambiguous after the join — alias it "
                    f"in a subquery before grouping"
                )
            out.append(tokens[i + 2])
            i += 3
            continue
        out.append(t)
        i += 1
    return out


def _derived_name(expr: list[Tok]) -> str:
    """Column name for an unaliased select item: a plain (possibly
    qualified) column ref names its last component, like Spark/the
    reference; anything else keeps its rendered text."""
    if all(t.kind == "name" or t.text == "." for t in expr) and expr[-1].kind == "name":
        return expr[-1].text.strip("`")
    return render(expr)


def _depth_at(tokens: list[Tok], idx: int) -> int:
    depth = 0
    for t in tokens[:idx]:
        if t.text in "([":
            depth += 1
        elif t.text in ")]":
            depth -= 1
    return depth


