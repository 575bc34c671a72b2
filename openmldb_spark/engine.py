"""Statement-level engine facade — the equivalent of the reference's
SQL router + TaskManager entry points (SURVEY §3.3).

The reference routes statements via CmdType (``node_enum.h:282-330``):
DDL goes to the nameserver, offline DML (LOAD DATA / SELECT INTO / SELECT)
to Spark jobs via TaskManager, DEPLOY compiles a named request-mode
procedure. Here everything is one process: an in-memory catalog of
DataFrames + table metadata, and ``execute(sql)`` dispatching on the first
keywords.

Statements:

- ``CREATE DATABASE d`` / ``USE d`` / ``DROP DATABASE d``
- ``CREATE TABLE t (col type..., INDEX(KEY=..., TS=..., TTL=..., TTL_TYPE=...))``
  (DDL: ``docs/en/openmldb_sql/ddl/CREATE_TABLE_STATEMENT.md:223-244``)
- ``DROP TABLE t``
- ``INSERT INTO t VALUES (...), (...)``
- ``LOAD DATA INFILE 'path' INTO TABLE t OPTIONS(format='csv', ...)``
- ``SELECT ... INTO OUTFILE 'path' OPTIONS(...)``
- ``DEPLOY name SELECT ...`` — request-mode procedure (below)
- ``SELECT ...`` — the query front end (:mod:`openmldb_spark.sql`)
- ``SHOW TABLES`` / ``SHOW DATABASES`` / ``SHOW DEPLOYMENTS``

DEPLOY semantics (ref ``DEPLOY_STATEMENT.md``; ``PhysicalRequestUnionNode``
``physical_op.h:1504-1615``): the deployed SELECT's main table becomes the
request table. ``run_batch`` executes the SQL unchanged over stored data
(batch = request-for-every-row, ``WINDOW_CLAUSE.md:78-86``). ``run_request``
rewrites every window to ``UNION __history ... INSTANCE_NOT_IN_WINDOW`` so
each request row's frames see stored history + the request row itself and
nothing else — the RequestUnion merge, train/serve consistent by
construction.
"""

from __future__ import annotations

import copy
import datetime
import re
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openmldb_spark.catalog import IndexDef, TableDef
from openmldb_spark.jobs import JOB_SCHEMA, JobManager
from openmldb_spark.plans.deploy import Deployment
from openmldb_spark.sources.loader import load_data, select_into
from openmldb_spark.sql import parser as P
from openmldb_spark.sql.lowering import Lowerer
from openmldb_spark.sql.parser import Tok, render, tokenize

_TYPES = {
    "bool": "boolean", "boolean": "boolean",
    "smallint": "short", "int16": "short",
    "int": "int", "int32": "int", "integer": "int",
    "bigint": "long", "int64": "long",
    "float": "float", "double": "double",
    "date": "date", "timestamp": "timestamp",
    "string": "string", "varchar": "string",
}


class _NsView:
    """Dict-like view over the engine's CURRENT database namespace that
    transparently routes mangled ``__omdb__db__t`` keys to their home
    database. Iteration/keys cover the current database only (SHOW TABLES
    semantics)."""

    def __init__(self, eng: "Engine", which: str):
        self._eng, self._which = eng, which

    def _slot(self, key: str):
        db, bare = self._eng._loc(key)
        store = getattr(self._eng, self._which)
        if db not in store:
            raise KeyError(key)
        return store[db], bare

    def __getitem__(self, key: str):
        d, bare = self._slot(key)
        return d[bare]

    def __setitem__(self, key: str, val) -> None:
        d, bare = self._slot(key)
        d[bare] = val

    def __contains__(self, key: str) -> bool:
        try:
            d, bare = self._slot(key)
        except KeyError:
            return False
        return bare in d

    def get(self, key: str, default=None):
        return self[key] if key in self else default

    def pop(self, key: str, default=None):
        try:
            d, bare = self._slot(key)
        except KeyError:
            return default
        return d.pop(bare, default)

    def _cur(self) -> dict:
        return getattr(self._eng, self._which)[self._eng.current_db]

    def __iter__(self):
        return iter(self._cur())

    def __len__(self) -> int:
        return len(self._cur())

    def keys(self):
        return self._cur().keys()

    def items(self):
        return self._cur().items()

    def values(self):
        return self._cur().values()


class _TTLView(dict):
    """Lazy Lowerer resolution mapping: a name resolves to its TTL-filtered
    DataFrame on first lookup (``__missing__``), so a statement only pays
    plan construction for the tables it references. Explicit assignments
    (``view['__history'] = df``) shadow catalog names, dict-style."""

    def __init__(self, eng: "Engine"):
        super().__init__()
        self._eng = eng

    def _locate(self, key: str):
        eng = self._eng
        db, bare = eng._loc(key)
        df = eng._dbs.get(db, {}).get(bare)
        if df is not None and eng._offline_mode:
            # offline reads see the table's OFFLINE store (empty until an
            # offline import/insert), never online rows — the reference's
            # storage split
            df = eng._db_off.get(db, {}).get(bare, df.limit(0))
        return db, bare, df

    def __missing__(self, key: str) -> DataFrame:
        db, bare, df = self._locate(key)
        if df is None:
            raise KeyError(key)
        out = self._eng._with_ttl(db, bare, df)
        self[key] = out
        return out

    def __contains__(self, key) -> bool:
        return dict.__contains__(self, key) or self._locate(key)[2] is not None

    def get(self, key, default=None):
        try:
            return self[key]
        except KeyError:
            return default


class Engine:
    """One engine = one SparkSession + one catalog of named tables."""

    #: prefix marking a db-qualified table reference rewritten to one flat
    #: token (`db1.t0` -> `__omdb__db1__t0`) so the single-namespace
    #: parser/lowerer machinery works unchanged across databases
    _DBM = "__omdb__"

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.current_db = "default"
        #: db -> {table name -> DataFrame}; the reference's multi-database
        #: catalog (USE / db-qualified names, test_multiple_databases.yaml)
        self._dbs: dict[str, dict[str, DataFrame]] = {"default": {}}
        self._db_defs: dict[str, dict[str, TableDef]] = {"default": {}}
        #: mangled flat name -> (db, bare name) — exact demangle map
        self._mangled: dict[str, tuple[str, str]] = {}
        #: deployments live in a database like tables do (SHOW DEPLOYMENT
        #: reports dbName; the reference scopes them per-db)
        self._db_deps: dict[str, dict[str, "SqlDeployment"]] = {"default": {}}
        #: name -> (is_aggregate, return_type_ddl, source_file)
        self.functions: dict[str, tuple[bool, str, str]] = {}
        #: session variables (SET / SHOW VARIABLES) — seeded with the
        #: reference's standard four (SHOW_VARIABLES_STATEMENT.md); unknown
        #: names are stored and echoed, like the reference. Divergent
        #: defaults: execute_mode=online (no offline/online storage split
        #: here) and sync_job=true (DIVERGENCES #18)
        self.variables: dict[str, str] = {
            "enable_trace": "false",
            "execute_mode": "online",
            "job_timeout": "20000",
            "sync_job": "true",
        }
        #: offline-job log (the reference's TaskManager job table, SURVEY
        #: §3.3): LOAD DATA / SELECT INTO run as tracked jobs under their
        #: own Spark job groups (openmldb_spark.jobs) — synchronous by
        #: default (divergence: the reference defaults async; SET
        #: @@sync_job='false' restores that), with SHOW JOBS / SHOW JOB /
        #: STOP JOB over the live state machine
        self.jobman = JobManager(spark)
        #: OFFLINE storage, per db per table — the reference keeps online
        #: (tablet) and offline (HDFS) data as SEPARATE stores and
        #: execute_mode picks which one reads and imports/inserts touch
        #: (docs SET_STATEMENT.md; out_in/test_select_into_load_data.yaml
        #: interleaves the two). Offline storage starts empty; absent
        #: entries read as an empty frame with the table's schema.
        self._db_off: dict[str, dict[str, DataFrame]] = {}
        #: offline-info components per (db, table) — the reference's
        #: TableInfo offline_table_info (data_path + symbolic_paths +
        #: format): {"base": DataFrame|None (deep-copy data),
        #: "sym": {path: DataFrame} (soft copies / ALTER TABLE ADD
        #: OFFLINE_PATH), "fmt": str|None}. ``_db_off`` always holds the
        #: union; this ledger lets ALTER TABLE DROP OFFLINE_PATH rebuild it
        #: and SHOW TABLE STATUS report Offline_format/symbolic_paths.
        self._off_parts: dict[tuple, dict] = {}
        #: user registry (CREATE/ALTER/DROP USER, SHOW CURRENT_USER) —
        #: name -> password. Metadata only: a single-session engine has no
        #: authentication boundary (the reference authenticates at the
        #: nameserver); seeded with root like the reference.
        self.users: dict[str, str] = {"root": ""}
        self.current_user = "root"
        #: (db, bare) -> table id (SHOW TABLE STATUS Table_id) — assigned
        #: in registration order like the reference's nameserver tid
        self._table_ids: dict[tuple, int] = {}
        self._next_tid = 1

    @property
    def databases(self) -> set[str]:
        return set(self._dbs)

    @property
    def tables(self) -> "_NsView":
        """The CURRENT database's table namespace; mangled db-qualified
        keys transparently route to their home database."""
        return _NsView(self, "_dbs")

    @property
    def table_defs(self) -> "_NsView":
        return _NsView(self, "_db_defs")

    @property
    def deployments(self) -> dict[str, "SqlDeployment"]:
        return self._db_deps.setdefault(self.current_db, {})

    # -- db-qualified name handling ------------------------------------------
    def _loc(self, name: str) -> tuple[str, str]:
        """(db, bare table name) for a possibly-mangled name token.
        Backquoted identifiers normalize to their bare spelling, so
        ``CREATE TABLE `t-1```, ``INSERT INTO `t-1``` and ``FROM `t-1```
        all address one table (cases/plan/back_quote_identifier.yaml)."""
        if name in self._mangled:
            return self._mangled[name]
        return self.current_db, name.strip("`")

    def _with_ttl(self, db: str, name: str, df: DataFrame) -> DataFrame:
        """Online-mode reads see only TTL-live rows (the reference's online
        storage GCs per the FIRST index's TTL; data_expiration corpus).
        ``SET @@ttl_now_ms = <ms>`` pins "now" (deterministic tests);
        unset, the absolute bound derives from max(ts) in the data — the
        reproducible batch choice (catalog.apply_ttl)."""
        from openmldb_spark.catalog import apply_ttl

        if self.variables.get("execute_mode", "online") != "online":
            return df
        td = self._db_defs.get(db, {}).get(name)
        if td is None:
            return df
        for idx in td.indexes:
            if idx.ttl and idx.ts_col and idx.origin == "ddl":
                now = self.variables.get("ttl_now_ms")
                return apply_ttl(df, idx, now_ms=int(now) if now else None)
        return df

    @property
    def _offline_mode(self) -> bool:
        return self.variables.get("execute_mode", "online") == "offline"

    def _store_get(self, name: str, offline: Optional[bool] = None) -> DataFrame:
        """A table's storage under the given (default: current) execute
        mode. ``offline`` is passed explicitly by async jobs, which must
        keep the mode they were SUBMITTED under."""
        if offline is None:
            offline = self._offline_mode
        db, bare = self._loc(name)
        online = self._dbs[db][bare]
        if not offline:
            return online
        return self._db_off.get(db, {}).get(bare, online.limit(0))

    def _store_set(
        self, name: str, df: DataFrame, offline: Optional[bool] = None
    ) -> None:
        if offline is None:
            offline = self._offline_mode
        db, bare = self._loc(name)
        if offline:
            # full replacement of the offline store MUST go through the
            # offline-info ledger — a direct _db_off write leaves the
            # ledger base=None, and a later LOAD DATA mode='append' /
            # ALTER TABLE ADD OFFLINE_PATH rebuild would silently discard
            # these rows (ADVICE r7, high)
            parts = self._off_ledger(db, bare)
            parts["base"] = df
            parts["sym"] = {}
            self._off_rebuild(db, bare)
        else:
            self._dbs[db][bare] = df

    def _store_append(
        self, name: str, new: DataFrame, offline: Optional[bool] = None
    ) -> None:
        """Append rows to a table's store. Offline appends write through
        the offline-info ledger (into ``parts['base']``) so symbolic paths
        added by ALTER TABLE are never double-counted and later
        mode='append' loads keep the inserted rows."""
        if offline is None:
            offline = self._offline_mode
        db, bare = self._loc(name)
        if offline:
            parts = self._off_ledger(db, bare)
            parts["base"] = (
                new if parts["base"] is None else parts["base"].unionByName(new)
            )
            self._off_rebuild(db, bare)
        else:
            self._dbs[db][bare] = self._dbs[db][bare].unionByName(new)

    def _table_view(self) -> dict[str, DataFrame]:
        """Resolution mapping for the Lowerer: current db's tables under
        their bare names + every db's tables under mangled names. Reads are
        TTL-filtered (online semantics), materialized lazily per referenced
        table — not for the whole catalog on every statement."""
        return _TTLView(self)

    def _mangle_sql(self, sql_text: str) -> str:
        """Rewrite db-qualified references (`db1.t0`, `db1.t0.c1`) into flat
        single-token names. Current-db qualifiers are STRIPPED (so `db.t1.c1`
        with current db `db` resolves subquery alias t1 — reference id 7);
        other known dbs mangle to `__omdb__{db}__{t}`. Unknown-db refs pass
        through untouched and fail resolution downstream, matching the
        reference's 'database not found' errors. A qualifier that is also
        a table/subquery ALIAS declared in this statement is NOT mangled —
        `SELECT d.c1 FROM t AS d` with a database named `d` binds the
        alias, not the database (alias scope shadows the catalog)."""
        toks = tokenize(sql_text)
        aliases = _declared_aliases(toks)
        out: list[Tok] = []
        i, n, changed = 0, len(toks), False
        while i < n:
            t = toks[i]
            prev_dot = bool(out) and out[-1].text == "."
            if (
                t.kind == "name"
                and not prev_dot
                and t.text in self._dbs
                and t.text not in aliases
                and i + 2 < n
                and toks[i + 1].text == "."
                and toks[i + 2].kind == "name"
            ):
                changed = True
                if t.text == self.current_db:
                    out.append(toks[i + 2])
                else:
                    flat = f"{self._DBM}{t.text}__{toks[i + 2].text}"
                    self._mangled[flat] = (t.text, toks[i + 2].text)
                    out.append(Tok("name", flat))
                i += 3
                continue
            out.append(t)
            i += 1
        return render(out) if changed else sql_text

    # -- public ---------------------------------------------------------------
    def register(self, name: str, df: DataFrame) -> None:
        self.tables[name] = df

    def execute_script(self, script: str) -> list:
        """Run a ';'-separated statement script; returns per-statement
        results (the reference CLI's batch-file mode)."""
        out = []
        for stmt in _split_statements(script):
            out.append(self.execute(stmt))
        return out

    @staticmethod
    def statement_kind(sql_text: str) -> str:
        """Classify one statement WITHOUT executing it — the counterpart of
        the reference parser's top plan-node tag (``cases/plan/*.yaml``
        ``node_tree_str`` first node; ported as
        ``tests/plan_cases/ref_ported_plan_cases.yaml``). Returns the
        reference's tag names: ``kQuery``, ``kInsertStmt``, ``CREATE``,
        ``kCreateIndexStmt``, ``kCreateSpStmt``, ``kCreateUserStmt``,
        ``kAlterUserStmt``, ``kAlterTableStmt``, ``kDeleteStmt``,
        ``kDeployStmt``, ``kLoadDataStmt``, ``kSelectIntoStmt``,
        ``kSetStmt``, ``kShowStmt`` (SHOW JOBS with a FROM/LIKE tail), or
        ``CMD:<cmd_type>`` for the CLI-command nodes (show/desc/use/drop/
        create/stop/truncate/exit). Raises on statements the dialect
        rejects. Catalog-free: names are not resolved, so this accepts
        statements over tables that do not exist (parser parity, not
        execution)."""
        if re.match(r"\s*SET\b", sql_text, re.IGNORECASE):
            # value must be one literal/identifier token (the reference
            # rejects expressions: cmd.yaml set_select_mode_2,
            # error_unsupport set_global_to_expr)
            m = re.match(
                r"\s*SET\s+(?:(?:GLOBAL|SESSION)\s+|@@(?:(?:global|session)\.)?)?"
                r"[\w.]+\s*=\s*(.+?)\s*;?\s*$",
                sql_text,
                re.IGNORECASE | re.DOTALL,
            )
            if not m:
                raise ValueError(f"cannot parse SET statement: {sql_text!r}")
            vtoks = tokenize(m.group(1))
            if len(vtoks) != 1 or vtoks[0].kind not in ("str", "num", "name"):
                raise ValueError("SET value must be a single literal")
            return "kSetStmt"
        toks = tokenize(sql_text)
        if not toks:
            raise ValueError("empty statement")
        head = toks[0].upper
        second = toks[1].upper if len(toks) > 1 else ""
        if head in ("SELECT", "WITH") or (
            # match execute()'s set-op head check: EXCEPT/INTERSECT also
            # start with a parenthesized arm (ADVICE r7)
            head == "("
            and any(t.upper in ("UNION", "EXCEPT", "INTERSECT") for t in toks)
        ):
            if re.search(r"\bINTO\s+OUTFILE\s+", sql_text, re.IGNORECASE):
                return "kSelectIntoStmt"
            P.parse(sql_text)
            return "kQuery"
        if head == "INSERT":
            body = [t for t in toks if t.text != ";"]
            if not (len(body) > 3 and body[1].upper == "INTO"):
                raise ValueError("INSERT INTO <table> ... VALUES (...)")
            if not any(t.upper == "VALUES" for t in body):
                raise ValueError("INSERT requires VALUES")
            for bi, t in enumerate(body):
                if t.kind == "num" and t.text.isdigit():
                    # int64 overflow is a parse error in the reference
                    # (error_unsupport_sql.yaml id 21); a leading '-' folds
                    # into the literal, so the negative range is one wider
                    neg = bi > 0 and body[bi - 1].text == "-"
                    if int(t.text) > (1 << 63) - (0 if neg else 1):
                        raise ValueError(f"integer literal out of int64 range: {t.text}")
            return "kInsertStmt"
        if head == "CREATE":
            if second == "TABLE":
                return "CREATE"
            if second == "DATABASE":
                return "CMD:create"
            if second == "INDEX":
                return "kCreateIndexStmt"
            if second in ("PROCEDURE", "OR", "TEMP"):
                # CREATE [OR REPLACE] [TEMP] PROCEDURE (create.yaml id 17)
                return "kCreateSpStmt"
            if second == "USER":
                return "kCreateUserStmt"
            if second in ("FUNCTION", "AGGREGATE"):
                return "kCreateFunctionStmt"
            if second == "GROUP":
                return "CMD:create"
            raise ValueError(f"unsupported CREATE {second}")
        if head == "ALTER":
            if second == "USER":
                return "kAlterUserStmt"
            if second == "TABLE":
                # validate the action grammar without touching the catalog
                if not re.match(
                    r"\s*ALTER\s+TABLE\s+[`\w.]+\s+"
                    r"(ADD|DROP)\s+OFFLINE_PATH\s+'[^']*'"
                    r"(\s*,\s*(ADD|DROP)\s+OFFLINE_PATH\s+'[^']*')*\s*;?\s*$",
                    sql_text,
                    re.IGNORECASE,
                ):
                    raise ValueError("ALTER TABLE t ADD|DROP OFFLINE_PATH '<path>'")
                return "kAlterTableStmt"
            raise ValueError(f"unsupported ALTER {second}")
        if head == "DELETE":
            if second == "JOB":
                if len(toks) < 3 or toks[2].kind != "num":
                    raise ValueError("DELETE JOB takes a numeric job id")
                return "kDeleteStmt"
            if second != "FROM":
                raise ValueError("DELETE FROM <table> WHERE ... | DELETE JOB <id>")
            return "kDeleteStmt"
        if head == "DEPLOY":
            return "kDeployStmt"
        if head == "LOAD":
            if second != "DATA":
                raise ValueError("LOAD DATA INFILE ...")
            return "kLoadDataStmt"
        if head == "SHOW":
            if second == "JOB":
                if len(toks) < 3 or toks[2].text == ";":
                    # SHOW JOB without an id is a parse error
                    # (error_query.yaml id 9)
                    raise ValueError("SHOW JOB takes a job id")
                return "CMD:show"
            if second == "JOBS" and len(toks) > 2 and toks[2].text != ";":
                return "kShowStmt"
            return "CMD:show"
        if head in ("DESC", "DESCRIBE"):
            return "CMD:desc"
        if head == "USE":
            return "CMD:use"
        if head == "DROP":
            return "CMD:drop"
        if head == "STOP":
            if second != "JOB" or len(toks) < 3 or toks[2].text == ";":
                raise ValueError("STOP JOB <id>")
            return "CMD:stop"
        if head == "TRUNCATE":
            return "CMD:truncate"
        if head == "EXIT":
            return "CMD:exit"
        if head == "EXPLAIN":
            return "kExplainStmt"
        if head == "CALL":
            return "kCallStmt"
        raise ValueError(f"unsupported statement: {render(toks[:4])} ...")

    def execute(self, sql_text: str, parameters: Optional[Sequence] = None):
        """Run one statement. Returns a DataFrame for queries/SHOW, None
        for DDL/DML side effects, a SqlDeployment for DEPLOY.

        ``parameters`` binds positional ``?`` placeholders (the reference's
        prepared-statement surface — test_insert_prepared.yaml and the SDK's
        parameterized queries): values fold to literals before routing, so
        every statement kind (INSERT/DELETE/SELECT/...) accepts them."""
        if parameters is not None:
            sql_text = P.substitute_params(sql_text, parameters)
        # SET routes before tokenization (the '@@var' sigil isn't a token)
        if re.match(r"\s*SET\b", sql_text, re.IGNORECASE):
            return self._set(sql_text)
        # DEPLOYMENT statements route BEFORE db-qualifier mangling: the
        # reference's DROP DEPLOYMENT grammar takes a plain identifier
        # (db-qualified fails, test_drop_deploy id 3) while SHOW DEPLOYMENT
        # accepts db.name (test_show_deploy id 3)
        dm = re.match(
            r"\s*DROP\s+DEPLOYMENT\s+([\w.]+)\s*;?\s*$", sql_text, re.IGNORECASE
        )
        if dm:
            return self._drop_deployment(dm.group(1))
        sm = re.match(
            r"\s*SHOW\s+DEPLOYMENT\s+([\w.]+)\s*;?\s*$", sql_text, re.IGNORECASE
        )
        if sm:
            return self._show_deployment(sm.group(1))
        # SHOW CREATE PROCEDURE also routes pre-mangle: db.sp stays dotted
        # for _dep_lookup (the reference's kCmdShowCreateSp takes [db.]name)
        pm = re.match(
            r"\s*SHOW\s+CREATE\s+PROCEDURE\s+([\w.]+)\s*;?\s*$",
            sql_text,
            re.IGNORECASE,
        )
        if pm:
            return self._show_create_procedure(pm.group(1))
        # DROP PROCEDURE likewise routes pre-mangle: db.sp must stay dotted
        # for _dep_lookup (mangling would produce __omdb__db__sp, which
        # _dep_lookup cannot split back — ADVICE r7)
        dpm = re.match(
            r"\s*DROP\s+PROCEDURE\s+([\w.]+)\s*;?\s*$", sql_text, re.IGNORECASE
        )
        if dpm:
            return self._drop_procedure(dpm.group(1))
        sql_text = self._mangle_sql(sql_text)
        toks = tokenize(sql_text)
        if not toks:
            return None
        head = toks[0].upper
        second = toks[1].upper if len(toks) > 1 else ""
        if head == "CREATE" and second == "DATABASE":
            if_not_exists = len(toks) > 4 and toks[2].upper == "IF"
            name = toks[5].text if if_not_exists else toks[2].text
            if name in self._dbs:
                if if_not_exists:
                    return None
                raise ValueError(f"database {name!r} already exists")
            self._dbs[name] = {}
            self._db_defs[name] = {}
            self._db_deps[name] = {}
            return None
        if head == "DROP" and second == "DATABASE":
            name = toks[4].text if toks[2].upper == "IF" else toks[2].text
            if name == self.current_db:
                raise ValueError("cannot drop the current database")
            self._dbs.pop(name, None)
            self._db_defs.pop(name, None)
            self._db_deps.pop(name, None)
            self._db_off.pop(name, None)
            for key in [k for k in self._off_parts if k[0] == name]:
                del self._off_parts[key]
            for key in [k for k in self._table_ids if k[0] == name]:
                del self._table_ids[key]
            return None
        if head == "USE":
            if toks[1].text not in self._dbs:
                raise ValueError(f"database {toks[1].text!r} does not exist")
            self.current_db = toks[1].text
            return None
        if head == "CREATE" and second == "TABLE":
            return self._create_table(toks)
        if head == "CREATE" and second in ("FUNCTION", "AGGREGATE"):
            return self._create_function(sql_text)
        if head == "DROP" and second == "FUNCTION":
            # DROP FUNCTION [IF EXISTS] name (cmd.yaml drop_function_*)
            guarded = len(toks) > 3 and toks[2].upper == "IF"
            fname = toks[4].text if guarded else toks[2].text
            if not guarded and fname not in self.functions:
                raise ValueError(f"function {fname!r} does not exist")
            self.spark.sql(f"DROP TEMPORARY FUNCTION IF EXISTS {fname}")
            self.functions.pop(fname, None)
            return None
        if head == "DROP" and second == "TABLE":
            db, bare = self._loc(toks[2].text)
            self.tables.pop(toks[2].text, None)
            self.table_defs.pop(toks[2].text, None)
            self._db_off.get(db, {}).pop(bare, None)
            self._off_parts.pop((db, bare), None)
            self._table_ids.pop((db, bare), None)
            return None
        if head == "INSERT":
            return self._insert(toks)
        if head == "DELETE":
            if second == "JOB":
                # JobInfoManager.scala:127 — "Delete job is not supported yet"
                raise ValueError("DELETE JOB is not supported")
            return self._delete(sql_text)
        if head == "TRUNCATE":
            # TRUNCATE TABLE t | TRUNCATE t (TRUNCATE_TABLE_STATEMENT.md)
            name = toks[2].text if second == "TABLE" else toks[1].text
            if name not in self.tables:
                raise ValueError(f"unknown table {name!r}")
            self.tables[name] = self.tables[name].limit(0)
            return None
        if head in ("DESC", "DESCRIBE"):
            return self._desc(toks[1].text)
        if head == "CREATE" and second == "INDEX":
            return self._create_index(sql_text)
        if head == "DROP" and second == "INDEX":
            # DROP INDEX table.index_name (DROP_INDEX_STATEMENT.md)
            tail = render(toks[2:]).replace(" ", "").rstrip(";")
            if "." not in tail:
                # the reference requires the qualified form
                # (test_delete_index id 4)
                raise ValueError("DROP INDEX takes <table>.<index_name>")
            tname, _, iname = tail.rpartition(".")
            td = self.table_defs.get(tname)
            if td is not None:
                td.indexes = [i for i in td.indexes if i.name != iname]
            return None
        if head == "ALTER" and second == "TABLE":
            return self._alter_table(toks)
        if head in ("CREATE", "ALTER", "DROP") and second == "USER":
            return self._user_admin(head, toks)
        if head == "CREATE" and second == "GROUP":
            # nameserver tablet-group management — no cluster topology to
            # group in a single-SparkSession engine (the parser accepts it;
            # see statement_kind)
            raise ValueError("CREATE GROUP is not supported by this engine")
        if head == "EXPLAIN":
            return self._explain(toks, sql_text)
        if head == "CALL":
            return self._call(toks)
        if head == "EXIT":
            # the CLI's session terminator — no interactive session here
            return None
        if head == "LOAD":
            return self._load_data(sql_text)
        if head == "DEPLOY":
            return self._deploy(toks, sql_text)
        if head == "CREATE" and second == "PROCEDURE":
            return self._create_procedure(sql_text)
        if head == "DROP" and second == "PROCEDURE":
            # reached only for spellings the pre-mangle route didn't match
            # (e.g. backquoted names) — the name is already bare here
            return self._drop_procedure(toks[2].text)
        if head == "SHOW" and second == "JOB" and len(toks) > 2 and toks[2].kind == "num":
            job = self.jobman.get(int(toks[2].text))
            return self.spark.createDataFrame([job.row()], JOB_SCHEMA)
        if head == "SHOW" and second == "JOBLOG":
            # SHOW JOBLOG job_id (SHOW_JOBLOG.md) — the job's lifecycle log
            if len(toks) < 3 or toks[2].kind != "num":
                raise ValueError("SHOW JOBLOG takes a numeric job id")
            job = self.jobman.get(int(toks[2].text))
            return self.spark.createDataFrame([(job.log_text(),)], "log string")
        if head == "SHOW" and second == "JOBS" and len(toks) > 2 and toks[2].text != ";":
            return self._show_jobs_from(toks)
        if head == "SHOW" and second == "TABLE" and len(toks) > 2 and toks[2].upper == "STATUS":
            return self._show_table_status(toks)
        if (
            head == "SHOW"
            and second == "PROCEDURE"
            and len(toks) > 2
            and toks[2].upper == "STATUS"
        ):
            # SHOW PROCEDURE STATUS ≡ SHOW PROCEDURES (cmd.yaml ids 9/10)
            return self._show("PROCEDURES")
        if head == "SHOW" and second == "CURRENT_USER":
            return self.spark.createDataFrame([(self.current_user,)], "User string")
        if head == "STOP" and second == "JOB":
            if len(toks) < 3 or toks[2].kind != "num":
                raise ValueError("STOP JOB takes a numeric job id")
            # cancels the job's Spark job group (kills its running stages)
            # and returns the job row with the final state — the
            # reference's JobInfoManager.stopJob contract
            job = self.jobman.stop(int(toks[2].text))
            return self.spark.createDataFrame([job.row()], JOB_SCHEMA)
        if head == "SHOW" and second == "CREATE":
            return self._show_create(toks[3].text)
        if (
            head == "SHOW"
            and second in ("SESSION", "GLOBAL")
            and len(toks) > 2
            and toks[2].upper == "VARIABLES"
        ):
            # SHOW [SESSION|GLOBAL] VARIABLES — one variable store here
            # (the reference's global/session split is a cluster concept)
            if any(t.text != ";" for t in toks[3:]):
                raise ValueError(f"unexpected tokens after SHOW {second} VARIABLES")
            return self._show("VARIABLES")
        if head == "SHOW":
            if any(t.text != ";" for t in toks[2:]):
                # e.g. `SHOW DEPLOYMENTS name` — the reference rejects
                # trailing tokens (test_show_deploy id 2)
                raise ValueError(f"unexpected tokens after SHOW {second}")
            return self._show(second)
        if head in ("SELECT", "WITH") or (
            head == "(" and any(t.upper in ("UNION", "EXCEPT", "INTERSECT") for t in toks)
        ):
            # head == "(": parenthesized set-operation arm
            # (union_query.yaml id 5)
            m = re.search(r"\bINTO\s+OUTFILE\s+", sql_text, re.IGNORECASE)
            if m:
                return self._select_into(sql_text, m)
            return Lowerer(self.spark, self._table_view()).query(P.parse(sql_text), {})
        raise ValueError(f"unsupported statement: {render(toks[:4])} ...")

    # -- DDL ------------------------------------------------------------------
    def _create_table(self, toks: list[Tok]):
        name = toks[2].text
        if len(toks) > 3 and toks[3].upper == "LIKE":
            # CREATE TABLE t LIKE PARQUET|HIVE '<path>'
            # (CREATE_TABLE_STATEMENT.md; cases/plan/create.yaml ids 32/33):
            # schema copied from the source, no data, no indexes
            if len(toks) < 6 or toks[5].kind != "str":
                raise ValueError("CREATE TABLE t LIKE PARQUET|HIVE '<path>'")
            like_kind = toks[4].upper
            path = toks[5].text.strip("'\"")
            if like_kind == "PARQUET":
                schema = self.spark.read.parquet(
                    path[7:] if path.startswith("file://") else path
                ).schema
            elif like_kind == "HIVE":
                # hive:// needs a metastore — same documented gap as LOAD
                # DATA's hive format (DataSourceUtil.scala)
                raise ValueError(
                    "CREATE TABLE LIKE HIVE needs a Hive metastore "
                    "(not available in this build)"
                )
            else:
                raise ValueError(f"CREATE TABLE LIKE takes PARQUET or HIVE, got {like_kind}")
            ddl = ", ".join(
                f"{f.name} {f.dataType.simpleString()}" for f in schema.fields
            )
            self.table_defs[name] = TableDef(name, ddl, [])
            self.tables[name] = self.spark.createDataFrame([], schema)
            db, bare = self._loc(name)
            self._tid(db, bare)
            return None
        # body between the outermost parens
        i = 3
        assert toks[i].text == "(", "CREATE TABLE t (...) expected"
        depth = 0
        j = i
        for j in range(i, len(toks)):
            if toks[j].text == "(":
                depth += 1
            elif toks[j].text == ")":
                depth -= 1
                if depth == 0:
                    break
        body = toks[i + 1 : j]
        cols: list[tuple[str, str]] = []
        indexes: list[IndexDef] = []
        not_null: set[str] = set()
        for item in _split_commas(body, angles=True):
            if item[0].upper == "INDEX":
                indexes.append(self._parse_index(item, len(indexes)))
            else:
                cname = item[0].text
                ctype, _k = _parse_coltype(item, 1)
                cols.append((cname, ctype))
                # NOT NULL is metadata only (DESC / API server table info) —
                # enforcing it on the DataFrame schema would reject the
                # reference's own null-bearing inserts; DEFAULT ignored
                if any(
                    t.upper == "NOT" and item[k + 1].upper == "NULL"
                    for k, t in enumerate(item[:-1])
                ):
                    not_null.add(cname)
        ddl = ", ".join(f"{c} {t}" for c, t in cols)
        td = TableDef(name, ddl, indexes, not_null=not_null)
        # trailing OPTIONS (storage_mode='Memory'|'SSD'|'HDD', partitionnum,
        # replicanum, ... — CREATE_TABLE_STATEMENT.md): storage_mode is
        # recorded for SHOW TABLE STATUS / disk-table DESC; the cluster
        # topology options have no meaning in one SparkSession
        if j + 1 < len(toks) and toks[j + 1].upper == "OPTIONS":
            k = _match_paren(toks, j + 2)
            for item in _split_commas(toks[j + 3 : k]):
                if item and item[0].upper == "STORAGE_MODE" and len(item) >= 3:
                    mode_v = item[2].text.strip("'\"").lower()
                    if mode_v not in ("memory", "ssd", "hdd"):
                        # CREATE_TABLE_STATEMENT.md: Memory|SSD|HDD only
                        raise ValueError(f"invalid storage_mode {mode_v!r}")
                    td.storage_mode = mode_v
        self.table_defs[name] = td
        self.tables[name] = self.spark.createDataFrame([], ddl)
        db, bare = self._loc(name)
        self._tid(db, bare)
        return None

    @staticmethod
    def _parse_index(item: list[Tok], n: int) -> IndexDef:
        # INDEX(KEY=a | KEY=(a,b), TS=ts, TTL=30d|100, TTL_TYPE=absolute)
        inner = item[2:-1]  # strip INDEX ( ... )
        opts: dict[str, list[Tok]] = {}
        for part in _split_commas(inner):
            key = part[0].upper
            opts[key] = part[2:]  # skip '='
        keys_toks = opts.get("KEY", [])
        keys = [t.text for t in keys_toks if t.kind == "name"]
        ts = opts["TS"][0].text if "TS" in opts else None
        ttl = render(opts["TTL"]) if "TTL" in opts else None
        ttl_type = opts["TTL_TYPE"][0].text.lower() if "TTL_TYPE" in opts else "absolute"
        if ttl and ttl.startswith("("):
            # DDL paired spelling TTL=(abs, lat) -> the canonical "a&&b" /
            # "a||b" form the reference's DESC prints and catalog.apply_ttl
            # splits on (absandlat conjoins, absorlat disjoins)
            parts = [p.strip() for p in ttl.strip("()").split(",")]
            ttl = ("||" if ttl_type == "absorlat" else "&&").join(parts)
        iname = opts["NAME"][0].text if "NAME" in opts else f"idx{n}"
        return IndexDef(iname, keys=keys, ts_col=ts, ttl=ttl, ttl_type=ttl_type)

    # -- DML ------------------------------------------------------------------
    def _insert(self, toks: list[Tok]):
        # INSERT INTO t [(cols)] VALUES (...), (...)
        assert toks[1].upper == "INTO"
        name = toks[2].text
        if name not in self.tables:
            raise ValueError(f"unknown table {name!r}")
        i = 3
        cols: Optional[list[str]] = None
        if toks[i].text == "(":
            j = _match_paren(toks, i)
            cols = [t.text for t in toks[i + 1 : j] if t.kind == "name"]
            i = j + 1
        assert toks[i].upper == "VALUES"
        i += 1
        rows = []
        while i < len(toks) and toks[i].text == "(":
            j = _match_paren(toks, i)
            rows.append([_literal(v) for v in _split_commas(toks[i + 1 : j])])
            i = j + 1
            if i < len(toks) and toks[i].text == ",":
                i += 1
        if i < len(toks) and toks[i].text != ";":
            # e.g. `INSERT ... VALUES (...) OUTFILE 'x'` — the reference
            # rejects trailing clauses (test_out_in id 5)
            raise ValueError(
                f"unexpected tokens after INSERT VALUES: {render(toks[i:i+3])}"
            )
        existing = self._store_get(name)
        schema = existing.schema
        if cols:
            order = {c: k for k, c in enumerate(cols)}
            rows = [
                [r[order[f.name]] if f.name in order else None for f in schema.fields]
                for r in rows
            ]
        rows = [
            [_coerce(v, f.dataType) for v, f in zip(r, schema.fields)] for r in rows
        ]
        new = self.spark.createDataFrame(rows, schema)
        self._store_append(name, new)
        return None

    def _delete(self, sql_text: str):
        """DELETE FROM t WHERE cond (ref: docs/en/openmldb_sql/dml/
        DELETE_STATEMENT.md:7) — batch anti-filter rewrite of the managed
        table; rows where the condition is NULL do not match and are kept."""
        from openmldb_spark.operators.relational import delete_where
        from openmldb_spark.sql.rewrite import rewrite_expr

        m = re.match(
            r"\s*DELETE\s+FROM\s+(\w+)\s+WHERE\s+(.+?)\s*;?\s*$",
            sql_text,
            re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise ValueError("DELETE FROM <table> WHERE <condition>")
        name, cond_s = m.group(1), m.group(2)
        if name not in self.tables:
            raise ValueError(f"unknown table {name!r}")
        cond = F.expr(rewrite_expr(tokenize(cond_s)))
        self.tables[name] = delete_where(self.tables[name], cond)
        return None

    def _desc(self, name: str) -> DataFrame:
        """DESC t — column name/type/nullability plus index summaries
        (ref: docs/en/openmldb_sql/ddl/DESC_STATEMENT.md)."""
        if name not in self.tables:
            raise ValueError(f"unknown table {name!r}")
        rows = [
            (f.name, f.dataType.simpleString(), "YES" if f.nullable else "NO")
            for f in self.tables[name].schema.fields
        ]
        td = self.table_defs.get(name)
        for idx in (td.indexes if td else []):
            rows.append(
                (
                    f"__index__{idx.name}",
                    f"keys={','.join(idx.keys)} ts={idx.ts_col} "
                    f"ttl={idx.ttl} ttl_type={idx.ttl_type}",
                    "",
                )
            )
        return self.spark.createDataFrame(rows, "field string, type string, null string")

    def _show_create(self, name: str) -> DataFrame:
        """SHOW CREATE TABLE t (SHOW_CREATE_TABLE_STATEMENT.md)."""
        if name not in self.tables:
            raise ValueError(f"unknown table {name!r}")
        cols = ", ".join(
            f"{f.name} {f.dataType.simpleString()}"
            for f in self.tables[name].schema.fields
        )
        td = self.table_defs.get(name)
        idx_parts = [
            f"INDEX(KEY={','.join(i.keys)}"
            + (f", TS={i.ts_col}" if i.ts_col else "")
            + (f", TTL={i.ttl}" if i.ttl else "")
            + (f", TTL_TYPE={i.ttl_type}" if i.ttl else "")
            + ")"
            for i in (td.indexes if td else [])
        ]
        body = ", ".join([cols, *idx_parts])
        ddl = f"CREATE TABLE {name} ({body})"
        return self.spark.createDataFrame([(name, ddl)], "table string, create_sql string")

    def _create_index(self, sql_text: str):
        """CREATE INDEX idx ON t (keys) OPTIONS (ts=..., ttl=..., ttl_type=...)
        (ref: CREATE_INDEX_STATEMENT.md). Index metadata only — layout is
        applied on demand via catalog.layout_for_index / apply_ttl."""
        m = re.match(
            r"\s*CREATE\s+INDEX\s+(\w+)\s+ON\s+(\w+)\s*\(([^)]*)\)\s*"
            r"(?:OPTIONS\s*\(([^)]*)\))?\s*;?\s*$",
            sql_text,
            re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise ValueError("CREATE INDEX name ON table (keys) [OPTIONS(...)]")
        iname, tname = m.group(1), m.group(2)
        if tname not in self.tables:
            raise ValueError(f"unknown table {tname!r}")
        keys = [k.strip() for k in m.group(3).split(",") if k.strip()]
        opts = _parse_options(m.group(4) or "")
        idx = IndexDef(
            iname,
            keys,
            opts.get("ts"),
            opts.get("ttl"),
            opts.get("ttl_type", "absolute").lower(),
        )
        td = self.table_defs.get(tname)
        if td is None:
            td = TableDef(tname, schema_ddl="")
            self.table_defs[tname] = td
        td.indexes.append(idx)
        return None

    def _set(self, sql_text: str):
        """SET [@@[session.|global.]]var = value (SET_STATEMENT.md);
        unsupported names are rejected like the reference."""
        m = re.match(
            r"\s*SET\s+(?:@@)?(?:(?:SESSION|GLOBAL)\.)?(\w+)\s*=\s*(.+?)\s*;?\s*$",
            sql_text,
            re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise ValueError("SET [@@]var = value")
        name = m.group(1).lower()
        value = m.group(2).strip().strip("'\"")
        if name not in _KNOWN_VARIABLES:
            # the reference rejects unsupported system variables
            # (v040/test_execute_mode.yaml id 2; SET_STATEMENT.md's table
            # is the supported set)
            raise ValueError(f"unsupported system variable {name!r}")
        if name == "execute_mode" and value not in ("online", "offline"):
            raise ValueError(f"execute_mode must be online|offline, got {value!r}")
        self.variables[name] = value
        return None

    def _call(self, toks: list[Tok]) -> DataFrame:
        """CALL deployment (v1, v2, ...) — one-row request-mode invocation;
        arguments match the deployment's request-table schema
        (ref: docs/en/openmldb_sql/dml/CALL_STATEMENT.md)."""
        name = toks[1].text
        dep = self.deployments.get(name)
        if dep is None:
            raise ValueError(f"unknown deployment {name!r}")
        i = 2
        if i >= len(toks) or toks[i].text != "(":
            raise ValueError("CALL name (arg, ...)")
        j = _match_paren(toks, i)
        vals = [_literal(v) for v in _split_commas(toks[i + 1 : j])]
        schema = dep.input_schema
        if schema is None:
            raise ValueError(f"deployment {name!r} has no input schema")
        if len(vals) != len(schema.fields):
            raise ValueError(
                f"CALL {name}: {len(vals)} args != {len(schema.fields)} request columns"
            )
        row = [_coerce(v, f.dataType) for v, f in zip(vals, schema.fields)]
        req = self.spark.createDataFrame([row], schema)
        return dep.run_request(req)

    def _create_function(self, sql_text: str):
        """``CREATE [AGGREGATE] FUNCTION name(arg type, ...) RETURNS type
        OPTIONS (FILE='fns.py' [, ENTRY='pyname'] [, TYPE='pandas'|'python'])``
        (ref: docs/en/openmldb_sql/ddl/CREATE_FUNCTION.md — the reference
        loads a C++ .so; the Spark-first equivalent loads a Python module
        and registers the callable with ``spark.udf.register``).

        TYPE='pandas' (default) expects a vectorized callable
        (pandas Series -> Series, or Series -> scalar for AGGREGATE) and
        registers an Arrow-batched pandas UDF — the fast path; 'python'
        registers a row-at-a-time UDF (convenience only, ~10-100x slower).
        """
        m = re.match(
            r"\s*CREATE\s+(AGGREGATE\s+)?FUNCTION\s+(\w+)\s*\(([^)]*)\)\s*"
            r"RETURNS\s+(\w+)\s*(?:OPTIONS\s*\(([^)]*)\))?\s*;?\s*$",
            sql_text,
            re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise ValueError(
                "CREATE [AGGREGATE] FUNCTION name(arg type, ...) RETURNS type "
                "OPTIONS (FILE='...')"
            )
        is_agg = m.group(1) is not None
        name, ret_s = m.group(2), m.group(4).lower()
        opts = _parse_options(m.group(5) or "")
        if ret_s not in _TYPES:
            raise ValueError(f"unknown return type {ret_s!r}")
        ret_ddl = _TYPES[ret_s]
        path = opts.get("file")
        if not path:
            raise ValueError("CREATE FUNCTION requires OPTIONS (FILE='...')")
        entry = opts.get("entry", name)
        kind = opts.get("type", "pandas").lower()

        import importlib.util

        spec = importlib.util.spec_from_file_location(f"__omsk_udf_{name}", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        fn = getattr(mod, entry)

        from pyspark.sql.functions import PandasUDFType, pandas_udf, udf

        if is_agg or kind == "pandas":
            # for AGGREGATE the callable reduces a Series to a scalar; Spark
            # infers GROUPED_AGG vs SCALAR from the registered eval type
            wrapped = pandas_udf(
                fn, ret_ddl,
                PandasUDFType.GROUPED_AGG if is_agg else PandasUDFType.SCALAR,
            )
        else:
            wrapped = udf(fn, ret_ddl)
        self.spark.udf.register(name, wrapped)
        self.functions[name] = (is_agg, ret_ddl, path)
        return None

    def _load_data(self, sql_text: str):
        m = re.match(
            r"\s*LOAD\s+DATA\s+INFILE\s+'([^']+)'\s+INTO\s+TABLE\s+(\w+)"
            r"(?:\s+OPTIONS\s*\((.*)\))?\s*;?\s*$",
            sql_text,
            re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise ValueError("LOAD DATA INFILE '<path>' INTO TABLE <t> [OPTIONS(...)]")
        path, name, opts_s = m.group(1), m.group(2), m.group(3) or ""
        quoted: set = set()
        opts = _parse_options(opts_s, quoted)
        _check_options(opts, quoted, _LOAD_OPTS, "LOAD DATA")
        mode = opts.get("mode", "error_if_exists").lower()
        if mode == "errorifexists":
            mode = "error_if_exists"
        if mode not in ("append", "overwrite", "error_if_exists"):
            raise ValueError(f"invalid LOAD DATA mode {mode!r}")
        if name not in self.tables:
            # the reference requires the target table to exist
            # (test_out_in id 26)
            raise ValueError(f"unknown table {name!r}")
        deep = opts.get("deep_copy", "true").lower() == "true"
        # reference cluster import rules (LOAD_DATA_STATEMENT.md; corpus
        # out_in/test_select_into_load_data.yaml ids 39-50/59):
        # - online import only allows append (default error_if_exists errors)
        # - deep_copy=false (symbolic path) is offline-only, never append,
        #   and only onto a table with no existing offline info
        if not self._offline_mode:
            if mode != "append":
                raise ValueError(
                    "online import only supports mode='append' "
                    f"(got {mode!r})"
                )
            if not deep:
                raise ValueError(
                    "deep_copy=false is only supported by offline import"
                )
        else:
            _db, _bare = self._loc(name)
            has_off = _bare in self._db_off.get(_db, {})
            if not deep and has_off:
                # corpus rule (ids 45/46/48/59 vs 45-2/47/53): the FIRST
                # soft-copy load onto a clean offline state succeeds under
                # any mode; a soft copy onto EXISTING offline info (hard or
                # soft) always errors
                raise ValueError(
                    f"table {name!r} already has offline data; a "
                    "soft-copy load needs a clean offline state"
                )
            if mode == "error_if_exists" and has_off:
                raise ValueError(
                    f"LOAD DATA mode=error_if_exists: table {name!r} "
                    "already has offline data"
                )
        schema = None
        if name in self.table_defs:
            schema = self.table_defs[name].schema_ddl
        off = self._offline_mode

        def job_body() -> None:
            df = load_data(
                self.spark,
                path,
                fmt=opts.get("format", "csv").lower(),
                delimiter=opts.get("delimiter", ","),
                header=opts.get("header", "true").lower() == "true",
                null_value=opts.get("null_value", "null"),
                quote=opts.get("quote", '"'),
                schema=schema,
            )
            # an import is a job: the noop sink evaluates EVERY column so
            # malformed data fails the JOB (strict-cast errors surface
            # here), like the reference's offline import; count() would
            # prune the cast projections away. At scale this materializes
            # to managed storage; here the validated DataFrame is the
            # managed table, published only when the job succeeds.
            df.write.format("noop").mode("overwrite").save()
            # publish into the submit-time execute_mode's store (online vs
            # offline are separate, like the reference's tablet/HDFS split;
            # `off` is snapshotted — an async job keeps its mode even if
            # the session switches before it finishes)
            if not off:
                if mode == "append" and self._store_get(name, off).columns:
                    self._store_set(
                        name, self._store_get(name, off).unionByName(df), off
                    )
                else:
                    self._store_set(name, df, off)
                return
            # offline publish goes through the offline-info ledger so
            # ALTER TABLE DROP OFFLINE_PATH / SHOW TABLE STATUS see the
            # component structure (data_path vs symbolic_paths)
            _ldb, _lbare = self._loc(name)
            parts = self._off_ledger(_ldb, _lbare)
            if not deep:
                # soft copy: the path IS the data (clean state guaranteed
                # by the checks above)
                parts["sym"] = {path: df}
                parts["base"] = None
            elif mode == "append" and parts["base"] is not None:
                parts["base"] = parts["base"].unionByName(df)
            elif mode == "overwrite":
                # the reference's overwrite drops ALL offline info,
                # symbolic links AND the recorded format included
                parts["base"] = df
                parts["sym"] = {}
                parts["fmt"] = None
            else:
                parts["base"] = df
            if parts["fmt"] is None:
                parts["fmt"] = opts.get("format", "csv").lower()
            self._off_rebuild(_ldb, _lbare)

        # OpenmldbBatchjobManager.scala: online-mode imports are
        # ImportOnlineData jobs, offline ImportOfflineData
        jtype = (
            "ImportOnlineData"
            if self.variables.get("execute_mode", "online") == "online"
            else "ImportOfflineData"
        )
        job = self.jobman.submit(jtype, sql_text.strip(), job_body, sync=self._sync_job)
        # async submit hands back the job row (the reference CLI prints it);
        # sync keeps the statement's side-effect-only contract
        return None if self._sync_job else self.spark.createDataFrame(
            [job.row()], JOB_SCHEMA
        )

    def _select_into(self, sql_text: str, m: "re.Match"):
        # SELECT ... INTO OUTFILE 'path' [OPTIONS(...)]
        tail = sql_text[m.end():]
        tm = re.match(r"'([^']+)'\s*(?:OPTIONS\s*\((.*)\))?\s*;?\s*$", tail,
                      re.IGNORECASE | re.DOTALL)
        if not tm:
            raise ValueError("INTO OUTFILE '<path>' [OPTIONS(...)]")
        path, opts_s = tm.group(1), tm.group(2) or ""
        quoted: set = set()
        opts = _parse_options(opts_s, quoted)
        _check_options(opts, quoted, _OUTFILE_OPTS, "OUTFILE")
        query = sql_text[: m.start()]
        # lowering is synchronous (schema/SQL errors fail the statement);
        # the write runs as the tracked job
        df = Lowerer(self.spark, self._table_view()).query(P.parse(query), {})

        def job_body() -> None:
            select_into(
                df,
                path,
                fmt=opts.get("format", "csv").lower(),
                delimiter=opts.get("delimiter", ","),
                header=opts.get("header", "true").lower() == "true",
                null_value=opts.get("null_value", "null"),
                quote=opts.get("quote", '"'),
                mode=opts.get("mode", "error_if_exists").lower(),
                coalesce=int(opts["coalesce"]) if "coalesce" in opts else None,
            )

        job = self.jobman.submit(
            "ExportOfflineData", sql_text.strip(), job_body, sync=self._sync_job
        )
        return None if self._sync_job else self.spark.createDataFrame(
            [job.row()], JOB_SCHEMA
        )

    @property
    def _sync_job(self) -> bool:
        """SET @@sync_job — default true here (divergence from the
        reference's async default: ported LOAD-then-SELECT scripts expect
        their data without polling; see openmldb_spark.jobs docstring)."""
        return self.variables.get("sync_job", "true").lower() != "false"

    # -- DEPLOY ---------------------------------------------------------------
    def _deploy(self, toks: list[Tok], sql_text: str):
        # DEPLOY name [OPTIONS(long_windows='w1:1d,...')] SELECT ...
        name = toks[1].text
        if name in self.deployments:
            # the reference rejects a duplicate deployment name
            # (test_create_deploy id 8)
            raise ValueError(f"deployment {name!r} already exists")
        if self._DBM in sql_text:
            # the reference rejects DEPLOY over db-qualified (cross-db)
            # tables (test_create_deploy ids 6/18) — the deployed procedure
            # is bound to ONE database
            raise ValueError("DEPLOY SQL must not reference other databases")
        om = re.search(
            r"OPTIONS\s*\(\s*long_windows\s*=\s*'([^']*)'\s*\)", sql_text, re.IGNORECASE
        )
        long_windows: dict[str, str] = {}
        if om:
            for part in om.group(1).split(","):
                wname, bucket = part.split(":")
                long_windows[wname.strip()] = bucket.strip()
        m = re.search(r"\b(SELECT|WITH)\b", sql_text, re.IGNORECASE)
        if not m:
            # e.g. `DEPLOY name INSERT ...` (test_create_deploy id 10)
            raise ValueError("DEPLOY requires a SELECT statement")
        select_sql = sql_text[m.start():]
        dep = SqlDeployment(self, name, select_sql, long_windows=long_windows)
        # compile-time validation, like the reference's deploy-time plan
        # build: lower the SELECT against the current catalog (no action
        # runs); unknown tables/columns or bad SQL fail the DEPLOY itself,
        # and the analyzed schema becomes the output contract. Parameterized
        # deploys (`?` placeholders) bind per-execution, so their schema is
        # resolved at first run instead.
        if not any(t.text == "?" for t in tokenize(select_sql)):
            dep.output_schema = Lowerer(self.spark, self._table_view()).query(
                P.parse(select_sql), {}
            ).schema
        self._auto_index(dep)
        self.deployments[name] = dep
        return dep

    def _auto_index(self, dep: "SqlDeployment") -> None:
        """DEPLOY creates the serving indexes its windows need (reference
        DEPLOY_STATEMENT.md "Index Requirements"; TTL derivation
        ``UpdateTTLByWindow``, ``src/base/ddl_parser.cc:530-562``):

        - ROWS frame -> latest-N index (N = |lower bound|, 0 -> 1). The
          reference expires latest-N lazily at GC, and reads see
          un-collected rows (its own deploy corpus pins this:
          cases/restful/v030 caseId 19 still aggregates pre-deploy rows),
          so the index is metadata here (``origin="deploy_lazy"``).
        - ROWS_RANGE frame -> absolute index of ceil(range / 1min)
          (``AbsTTLConvert``). The reference's storage iterator enforces
          absolute bounds at read time per ACCESS PATH — a row expired in
          the deploy index is still served through other indexes — so the
          filter applies only to this deployment's serving history
          (``SqlDeployment._serving_history``), never to plain reads.

        An existing index with the same keys+ts is left untouched: the DDL
        default TTL 0 means never-expire, and ``TTLValueMerge`` keeps the
        unbounded side (restful corpus caseId 2/3 vs 19/20)."""
        from openmldb_spark.operators.window import parse_interval_ms

        td = self.table_defs.get(dep.request_table)
        if td is None:
            return
        tcols = set(self.tables[dep.request_table].columns)
        for w in dep.query.body.windows.values():
            keys = []
            for ktoks in w.partition_by:
                names = [t.text for t in ktoks if t.kind == "name"]
                keys.append(names[-1] if names else None)
            onames = [t.text for t in (w.order_by or []) if t.kind == "name"]
            ts = onames[-1] if onames else None
            if (
                not keys
                or any(k is None or k not in tcols for k in keys)
                or ts is None
                or ts not in tcols
            ):
                # window over joined/derived columns — the reference indexes
                # the source table of those columns; out of scope here
                continue
            if any(
                set(i.keys) == set(keys) and i.ts_col == ts
                for i in td.indexes
            ):
                continue
            kind, bound = w.lower
            iname = f"deploy_{dep.name}_{len(td.indexes)}"
            if w.frame_kind == "rows_range":
                if kind == "preceding" and bound is not None:
                    ms = (
                        parse_interval_ms(bound)
                        if any(c.isalpha() for c in bound)
                        else int(bound)
                    )
                    mins = max(1, -(-ms // 60000))
                    idx = IndexDef(iname, keys, ts, ttl=f"{mins}min",
                                   ttl_type="absolute", origin="deploy")
                else:  # unbounded -> never expires
                    idx = IndexDef(iname, keys, ts, origin="deploy")
            else:
                n = int(bound) if kind == "preceding" and bound else 0
                idx = IndexDef(iname, keys, ts, ttl=str(max(1, n)),
                               ttl_type="latest", origin="deploy_lazy")
            td.indexes.append(idx)

    #: procedure param type -> acceptable Spark simpleString spellings
    _PROC_TYPES = {
        "string": {"string"}, "varchar": {"string"},
        "smallint": {"smallint", "short"}, "int16": {"smallint", "short"},
        "int": {"int", "integer"}, "int32": {"int", "integer"},
        "bigint": {"bigint", "long"}, "int64": {"bigint", "long"},
        "float": {"float"}, "double": {"double"},
        "timestamp": {"timestamp", "timestamp_ntz"}, "date": {"date"},
        "bool": {"boolean"}, "boolean": {"boolean"},
    }

    def _create_procedure(self, sql_text: str):
        """``CREATE PROCEDURE name(p1 t1, const p2 t2, ...) BEGIN <select>;
        END`` — the reference's stored-procedure surface (SQLClusterRouter::
        HandleSQLCreateProcedure; served over HTTP by the APIServer,
        ``src/apiserver/api_server_impl.cc:446``). A procedure is a
        deployment with an EXPLICIT input signature: the parameter list must
        match the request table's schema, and ``const`` parameters mark the
        batch-request common columns (``sdk::Schema::IsConstant``)."""
        m = re.match(
            r"\s*CREATE\s+PROCEDURE\s+(\w+)\s*\((.*?)\)\s*"
            r"BEGIN\s+(.*?)\s*END\s*;?\s*$",
            sql_text,
            re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise ValueError(
                "CREATE PROCEDURE name(args) BEGIN <select>; END"
            )
        name, params_s, body_sql = m.group(1), m.group(2), m.group(3)
        if name in self.deployments:
            raise ValueError(f"procedure {name!r} already exists")
        body_sql = body_sql.rstrip().rstrip(";")
        if not re.match(r"\s*(SELECT|WITH)\b", body_sql, re.IGNORECASE):
            raise ValueError("CREATE PROCEDURE body must be a SELECT")
        declared: list[tuple[str, str, bool]] = []  # (name, type, is_const)
        for part in params_s.split(","):
            ptoks = part.split()
            is_const = bool(ptoks) and ptoks[0].lower() == "const"
            if is_const:
                ptoks = ptoks[1:]
            if len(ptoks) != 2:
                raise ValueError(f"bad procedure parameter {part.strip()!r}")
            pname, ptype = ptoks[0].strip("`"), ptoks[1].lower()
            if ptype not in self._PROC_TYPES:
                raise ValueError(f"unknown parameter type {ptype!r}")
            declared.append((pname, ptype, is_const))
        dep = SqlDeployment(self, name, body_sql)
        dep.kind = "procedure"
        dep.create_sql = sql_text.strip()
        dep.const_cols = [n for n, _, c in declared if c]
        # compile-time validation + output contract, like _deploy
        if not any(t.text == "?" for t in tokenize(body_sql)):
            dep.output_schema = Lowerer(self.spark, self._table_view()).query(
                P.parse(body_sql), {}
            ).schema
        if dep.input_schema is not None:
            # the reference requires the signature to match the main
            # (request) table's schema exactly, column for column
            fields = dep.input_schema.fields
            if len(fields) != len(declared) or any(
                f.name != n or f.dataType.simpleString() not in self._PROC_TYPES[t]
                for f, (n, t, _) in zip(fields, declared)
            ):
                raise ValueError(
                    f"procedure signature does not match table "
                    f"{dep.request_table!r} schema"
                )
        self.deployments[name] = dep
        return dep

    #: Spark type -> the reference's column-type naming (SHOW DEPLOYMENT)
    _KTYPES = {
        "string": "kVarchar", "short": "kInt16", "smallint": "kInt16",
        "int": "kInt32", "integer": "kInt32", "bigint": "kInt64",
        "long": "kInt64", "float": "kFloat", "double": "kDouble",
        "timestamp": "kTimestamp", "timestamp_ntz": "kTimestamp",
        "date": "kDate", "boolean": "kBool",
    }

    def _dep_lookup(self, name: str) -> tuple[str, "SqlDeployment"]:
        db, _, bare = name.rpartition(".") if "." in name else ("", "", name)
        db = db or self.current_db
        if db not in self._dbs:
            raise ValueError(f"database {db!r} does not exist")
        dep = self._db_deps.setdefault(db, {}).get(bare)
        if dep is None:
            raise ValueError(f"unknown deployment {bare!r} in database {db!r}")
        return db, dep

    def _drop_deployment(self, name: str):
        if "." in name:
            # the reference's DROP DEPLOYMENT grammar takes a plain
            # identifier (test_drop_deploy id 3)
            raise ValueError("DROP DEPLOYMENT takes an unqualified name")
        db, _ = self._dep_lookup(name)
        del self._db_deps[db][name]
        return None

    def _drop_procedure(self, name: str):
        """DROP PROCEDURE [db.]name — routes pre-mangle (ADVICE r7): the
        qualifier must reach _dep_lookup dotted, like SHOW CREATE
        PROCEDURE (the reference's kCmdDropSp takes [db.]name)."""
        db, dep = self._dep_lookup(name)
        if dep.kind != "procedure":
            raise ValueError(f"procedure {name!r} not found")
        del self._db_deps[db][name.rpartition(".")[2]]
        return None

    def _show_deployment(self, name: str) -> DataFrame:
        """SHOW DEPLOYMENT [db.]name -> one row per input/output column:
        (deployment, db, sql, section, idx, column_name, column_type).
        Types use the reference's naming (kVarchar/kInt32/...)."""
        db, dep = self._dep_lookup(name)
        rows = []
        sections = [("input", dep.input_schema), ("output", dep.output_schema)]
        for section, schema in sections:
            if schema is None:
                continue
            for i, f in enumerate(schema.fields, 1):
                st = f.dataType.simpleString()
                rows.append(
                    (dep.name, db, dep.sql_text, section, i, f.name,
                     self._KTYPES.get(st, st))
                )
        return self.spark.createDataFrame(
            rows,
            "deployment string, db string, sql string, section string, "
            "idx int, column_name string, column_type string",
        )

    # -- SHOW -----------------------------------------------------------------
    # -- ALTER / users / status surface ---------------------------------------
    def _tid(self, db: str, bare: str) -> int:
        """Stable table id in registration order (the nameserver's tid)."""
        key = (db, bare)
        if key not in self._table_ids:
            self._table_ids[key] = self._next_tid
            self._next_tid += 1
        return self._table_ids[key]

    def _off_ledger(self, db: str, bare: str) -> dict:
        return self._off_parts.setdefault(
            (db, bare), {"base": None, "sym": {}, "fmt": None}
        )

    def _off_rebuild(self, db: str, bare: str) -> None:
        """Recompose the offline store from its ledger (base ∪ symbolic)."""
        parts = self._off_ledger(db, bare)
        dfs = ([parts["base"]] if parts["base"] is not None else []) + list(
            parts["sym"].values()
        )
        if not dfs:
            self._db_off.get(db, {}).pop(bare, None)
            self._off_parts.pop((db, bare), None)
            return
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        self._db_off.setdefault(db, {})[bare] = out

    def _alter_table(self, toks: list[Tok]):
        """``ALTER TABLE [db.]t (ADD|DROP) OFFLINE_PATH 'path' [, ...]`` —
        the reference's only ALTER TABLE form (ALTER_STATEMENT.md;
        AddPathAction/DropPathAction, cases/plan/cmd.yaml alter-table-*):
        edit the offline table info's symbolic path list. Spark-first: a
        symbolic path is a lazy ``spark.read`` over that path — the offline
        view unions it in; nothing is copied (the reference likewise only
        updates nameserver metadata and reads at query time)."""
        if len(toks) < 3:
            raise ValueError("ALTER TABLE <name> ADD|DROP OFFLINE_PATH '<path>'")
        name = toks[2].text
        if name not in self.tables:
            raise ValueError(f"unknown table {name!r}")
        db, bare = self._loc(name)
        # parse the action list: (ADD|DROP) OFFLINE_PATH '<path>' {, ...}
        i = 3
        actions: list[tuple[str, str]] = []
        while i < len(toks) and toks[i].text != ";":
            act = toks[i].upper
            if act not in ("ADD", "DROP"):
                raise ValueError(f"ALTER TABLE action must be ADD or DROP, got {toks[i].text!r}")
            if i + 2 >= len(toks) or toks[i + 1].upper != "OFFLINE_PATH":
                raise ValueError("ALTER TABLE only supports ADD/DROP OFFLINE_PATH")
            if toks[i + 2].kind != "str":
                raise ValueError("OFFLINE_PATH takes a quoted path")
            actions.append((act, toks[i + 2].text.strip("'\"")))
            i += 3
            if i < len(toks) and toks[i].text == ",":
                i += 1
        if not actions:
            raise ValueError("ALTER TABLE <name> ADD|DROP OFFLINE_PATH '<path>'")
        # apply to a COPY of the ledger and commit only when every action
        # succeeds — a failed multi-action statement must not half-apply
        old = self._off_parts.get((db, bare)) or {"base": None, "sym": {}, "fmt": None}
        parts = {"base": old["base"], "sym": dict(old["sym"]), "fmt": old["fmt"]}
        schema = None
        if name in self.table_defs:
            schema = self.table_defs[name].schema_ddl
        for act, path in actions:
            if act == "ADD":
                if path in parts["sym"]:
                    raise ValueError(f"offline path {path!r} already added")
                fmt = parts["fmt"] or _infer_fmt(path)
                parts["sym"][path] = load_data(
                    self.spark, path, fmt=fmt, schema=schema
                )
                parts["fmt"] = fmt
            else:
                if path not in parts["sym"]:
                    raise ValueError(f"offline path {path!r} not found on {name!r}")
                del parts["sym"][path]
        self._off_parts[(db, bare)] = parts
        self._off_rebuild(db, bare)
        return None

    def _user_admin(self, head: str, toks: list[Tok]):
        """CREATE/ALTER/DROP USER (+IF [NOT] EXISTS, OPTIONS(password=...))
        — CREATE_USER/ALTER_USER/DROP_USER_STATEMENT.md. Metadata registry:
        one SparkSession has no authentication boundary to enforce."""
        i = 2
        guarded = False
        if len(toks) > i and toks[i].upper == "IF":
            # CREATE USER IF NOT EXISTS x / ALTER|DROP USER IF EXISTS x
            guarded = True
            i += 3 if head == "CREATE" else 2
        if i >= len(toks) or toks[i].kind != "name":
            raise ValueError(f"{head} USER takes a user name")
        name = toks[i].text
        i += 1
        if head == "ALTER" and i < len(toks) and toks[i].upper == "SET":
            i += 1
        opts: dict[str, str] = {}
        if i < len(toks) and toks[i].upper == "OPTIONS":
            j = _match_paren(toks, i + 1)
            quoted: set = set()
            opts = _parse_options(render(toks[i + 2 : j]), quoted)
            i = j + 1
        bad = set(opts) - {"password"}
        if bad:
            # the reference: "Only the password can be specified"
            raise ValueError(f"unsupported user option(s): {sorted(bad)}")
        if i < len(toks) and toks[i].text != ";":
            raise ValueError(f"unexpected tokens after {head} USER: {render(toks[i:i+3])}")
        if head == "CREATE":
            if name in self.users:
                if guarded:
                    return None
                raise ValueError(f"user {name!r} already exists")
            self.users[name] = opts.get("password", "")
        elif head == "ALTER":
            if name not in self.users:
                if guarded:
                    return None
                raise ValueError(f"user {name!r} does not exist")
            if "password" in opts:
                self.users[name] = opts["password"]
        else:  # DROP
            if name == "root":
                # the reference refuses to drop root (HandleDropUser)
                raise ValueError("cannot drop user 'root'")
            if name not in self.users:
                if guarded:
                    return None
                raise ValueError(f"user {name!r} does not exist")
            del self.users[name]
        return None

    def _show_jobs_from(self, toks: list[Tok]) -> DataFrame:
        """SHOW JOBS FROM TASKMANAGER|NAMESERVER [LIKE 'pat'] (SHOW_JOBS.md).
        All this engine's jobs are TaskManager-style offline jobs; the
        nameserver's internal op list has no analogue (no tablets), so FROM
        NAMESERVER is always empty."""
        i = 2
        component = "TASKMANAGER"
        if toks[i].upper == "FROM":
            if i + 1 >= len(toks) or toks[i + 1].upper not in (
                "TASKMANAGER", "NAMESERVER",
            ):
                raise ValueError("SHOW JOBS FROM takes TASKMANAGER or NAMESERVER")
            component = toks[i + 1].upper
            i += 2
        pattern = None
        if i < len(toks) and toks[i].upper == "LIKE":
            if i + 1 >= len(toks) or toks[i + 1].kind != "str":
                raise ValueError("SHOW JOBS ... LIKE takes a quoted pattern")
            pattern = toks[i + 1].text.strip("'\"")
            i += 2
        if i < len(toks) and toks[i].text != ";":
            raise ValueError(f"unexpected tokens after SHOW JOBS: {render(toks[i:i+3])}")
        rows = self.jobman.rows() if component == "TASKMANAGER" else []
        if pattern is not None:
            rx = re.compile("^" + _like_to_regex(pattern) + "$", re.IGNORECASE)
            rows = [r for r in rows if rx.match(str(r[0]))]
        return self.spark.createDataFrame(rows or [], JOB_SCHEMA)

    def _show_table_status(self, toks: list[Tok]) -> DataFrame:
        """SHOW TABLE STATUS [LIKE 'db-pattern'] (SHOW_TABLE_STATUS.md) —
        one row per table; the LIKE pattern matches DATABASE names (the
        reference's semantics), no pattern means the current database.
        Sizes come from Catalyst plan statistics (the metadata-level
        answer — no data scan); Rows is the one per-table action."""
        i = 3
        pattern = None
        if i < len(toks) and toks[i].upper == "LIKE":
            if i + 1 >= len(toks) or toks[i + 1].kind != "str":
                raise ValueError("SHOW TABLE STATUS LIKE takes a quoted pattern")
            pattern = toks[i + 1].text.strip("'\"")
            i += 2
        if i < len(toks) and toks[i].text != ";":
            raise ValueError(
                f"unexpected tokens after SHOW TABLE STATUS: {render(toks[i:i+3])}"
            )
        if pattern is None:
            dbs = [self.current_db]
        else:
            rx = re.compile("^" + _like_to_regex(pattern) + "$", re.IGNORECASE)
            dbs = [d for d in sorted(self._dbs) if rx.match(d)]
        rows = []
        for db in dbs:
            for bare in sorted(self._dbs[db]):
                df = self._dbs[db][bare]
                td = self._db_defs.get(db, {}).get(bare)
                storage = td.storage_mode if td else "memory"
                nbytes = int(
                    str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
                )
                # Catalyst reports defaultSizeInBytes (~Long.Max) for leaves
                # it can't size (in-memory RDD-backed tables); the honest
                # metadata answer there is 0, like the reference's empty
                # tablet stats
                size = str(nbytes if nbytes < 1 << 60 else 0)
                parts = self._off_parts.get((db, bare)) or {}
                sym = ",".join(parts.get("sym", {})) or None
                n_part = df.rdd.getNumPartitions()
                rows.append(
                    (
                        str(self._tid(db, bare)), bare, db, storage,
                        str(df.count()),
                        size if storage == "memory" else "0",
                        "0" if storage == "memory" else size,
                        str(n_part), "0", "1",
                        None,
                        parts.get("fmt"),
                        sym,
                        "",
                    )
                )
        return self.spark.createDataFrame(
            rows or [],
            "Table_id string, Table_name string, Database_name string, "
            "Storage_type string, Rows string, Memory_data_size string, "
            "Disk_data_size string, Partition string, Partition_unalive string, "
            "Replica string, Offline_path string, Offline_format string, "
            "Offline_symbolic_paths string, Warnings string",
        )

    def _explain(self, toks: list[Tok], sql_text: str):
        """EXPLAIN [LOGICAL] <query> (cmd.yaml ids 8/9) — returns the
        engine's plan for the query as one row. Spark-first: the physical
        plan IS Spark's executed plan (what the reference's EXPLAIN prints
        from its own codegen pipeline), LOGICAL is Catalyst's optimized
        logical plan."""
        mode = "physical"
        body = toks[1:]
        if body and body[0].upper in ("LOGICAL", "PHYSICAL"):
            mode = body[0].text.lower()
            body = body[1:]
        if not body or body[0].upper not in ("SELECT", "WITH"):
            raise ValueError("EXPLAIN [LOGICAL] <select query>")
        while body and body[-1].text == ";":
            body = body[:-1]
        query = render(body)
        df = Lowerer(self.spark, self._table_view()).query(P.parse(query), {})
        qe = df._jdf.queryExecution()
        text = str(qe.optimizedPlan() if mode == "logical" else qe.executedPlan())
        return self.spark.createDataFrame([(text,)], "plan string")

    def _show_create_procedure(self, name: str) -> DataFrame:
        """SHOW CREATE PROCEDURE [db.]name -> (Procedure, Create Procedure)
        with the original DDL (divergence: the reference's handler builds
        the info but returns an empty result set — sql_cluster_router.cc
        kCmdShowCreateSp has its print commented out; returning the DDL is
        strictly more useful and mirrors SHOW CREATE TABLE)."""
        db, dep = self._dep_lookup(name)
        ddl = getattr(dep, "create_sql", None) or dep.sql_text
        return self.spark.createDataFrame(
            [(dep.name, ddl)], "`Procedure` string, `Create Procedure` string"
        )

    def _show(self, what: str) -> DataFrame:
        if what == "TABLES":
            rows = [(n,) for n in sorted(self.tables)]
            return self.spark.createDataFrame(rows or [], "table_name string")
        if what == "DATABASES":
            return self.spark.createDataFrame(
                [(d,) for d in sorted(self.databases)], "database_name string"
            )
        if what == "JOBS":
            return self.spark.createDataFrame(self.jobman.rows() or [], JOB_SCHEMA)
        if what == "DEPLOYMENTS":
            return self.spark.createDataFrame(
                [(n,) for n in sorted(self.deployments)] or [], "deployment string"
            )
        if what == "VARIABLES":
            # reference output contract: Variable_name / Value columns
            # (docs/en/openmldb_sql/ddl/SHOW_VARIABLES_STATEMENT.md)
            return self.spark.createDataFrame(
                sorted(self.variables.items()), "Variable_name string, Value string"
            )
        if what == "FUNCTIONS":
            rows = [
                (n, "AGGREGATE" if agg else "SCALAR", ret, path)
                for n, (agg, ret, path) in sorted(self.functions.items())
            ]
            return self.spark.createDataFrame(
                rows or [], "name string, kind string, return_type string, file string"
            )
        if what == "PROCEDURES":
            # kCmdShowProcedures: ("DB", "SP") rows across ALL databases —
            # the reference lists every stored procedure INCLUDING
            # deployments (a deployment IS a procedure of type
            # kReqDeployment; sql_cluster_router.cc:2126)
            rows = [
                (db, n)
                for db in sorted(self._db_deps)
                for n in sorted(self._db_deps[db])
            ]
            return self.spark.createDataFrame(rows or [], "DB string, SP string")
        if what == "COMPONENTS":
            # SHOW_COMPONENTS.md: (Endpoint, Role, Connect_time, Status,
            # Ns_role). One SparkSession plays every role the reference
            # distributes (tablet storage, nameserver catalog, taskmanager
            # jobs) — one row per role, all at the driver's endpoint.
            sc = self.spark.sparkContext
            try:
                host = sc.getConf().get("spark.driver.host")
                port = sc.getConf().get("spark.driver.port")
                endpoint = f"{host}:{port}"
            except Exception:
                endpoint = sc.master
            started = datetime.datetime.fromtimestamp(sc.startTime / 1000.0)
            rows = [
                (endpoint, role, started, "online",
                 "master" if role == "nameserver" else None)
                for role in ("tablet", "nameserver", "taskmanager")
            ]
            return self.spark.createDataFrame(
                rows,
                "Endpoint string, Role string, Connect_time timestamp, "
                "Status string, Ns_role string",
            )
        raise ValueError(f"SHOW {what} not supported")


class SqlDeployment:
    """A deployed SELECT: named, schema-contracted, two execution modes
    (see module docstring).

    ``long_windows`` ({window_name: bucket interval, e.g. 'w1': '1h'}) is
    the reference's ``OPTIONS(long_windows=...)`` — eligible windows
    (ROWS_RANGE, plain keys/order, single-column sum/count/avg/min/max,
    no EXCLUDE/MAXSIZE/UNION; ``long_window_optimized.cc
    VerifySingleAggregation``) are served from a materialized pre-agg
    table via :meth:`prepare_preagg` + :meth:`run_request_preagg`.
    """

    def __init__(
        self,
        engine: Engine,
        name: str,
        select_sql: str,
        long_windows: Optional[dict[str, str]] = None,
    ):
        self.engine = engine
        self.name = name
        self.sql_text = select_sql
        #: "deployment" (DEPLOY) vs "procedure" (CREATE PROCEDURE) — the
        #: reference's kReqDeployment / kReqProcedure split
        self.kind = "deployment"
        #: full CREATE PROCEDURE text (sp_info->GetSql())
        self.create_sql = select_sql
        #: const (common) request columns, procedure signatures only
        self.const_cols: list[str] = []
        self.long_windows = dict(long_windows or {})
        self.query = P.parse(select_sql)
        self._preagg: dict[tuple[str, str], DataFrame] = {}
        self.db_name = engine.current_db
        #: output schema, filled by Engine._deploy's validation lowering
        self.output_schema = None
        body = self.query.body
        # the request table may sit under subquery FROMs (`select ... from
        # (select ... from t) as x` — test_create_deploy id 4): descend to
        # the innermost named main table
        sel = body
        while (
            isinstance(sel, P.Select)
            and sel.from_ is not None
            and sel.from_.name is None
            and sel.from_.subquery is not None
        ):
            sel = sel.from_.subquery.body
        if not isinstance(sel, P.Select) or sel.from_ is None or sel.from_.name is None:
            raise ValueError("DEPLOY needs a SELECT with a named main table")
        self.request_table = sel.from_.name
        #: schema contract pinned at deploy time (if the table exists)
        t = engine.tables.get(self.request_table)
        self.input_schema = t.schema if t is not None else None

    def _query_with_params(self, parameters: Optional[Sequence]) -> P.Query:
        """The deployed query, with positional ``?`` placeholders bound to
        ``parameters`` (reference parameterized-query surface: the SDK
        binds a parameter row per execution against the same deployed
        plan; here binding = literal fold + re-parse of the stored text,
        so each call can carry different parameter values)."""
        if parameters is None:
            return copy.deepcopy(self.query)
        return P.parse(P.substitute_params(self.sql_text, parameters))

    def run_batch(
        self,
        history: Optional[DataFrame] = None,
        parameters: Optional[Sequence] = None,
    ) -> DataFrame:
        """Batch mode = request mode for every stored row: the SQL runs
        unchanged with the main table bound to ``history``."""
        tables = self.engine._table_view()
        if history is not None:
            tables[self.request_table] = history
        return Lowerer(self.engine.spark, tables).query(
            self._query_with_params(parameters), {}
        )

    def run_request(
        self,
        requests: DataFrame,
        history: Optional[DataFrame] = None,
        parameters: Optional[Sequence] = None,
    ) -> DataFrame:
        """Request mode: each request row's window frames see stored
        history + the request row itself, nothing else (RequestUnion
        merge). Request rows must not already be stored in history, same
        as the reference's compute-then-store serving flow."""
        if self.input_schema is not None and requests.schema != self.input_schema:
            raise ValueError(
                f"deployment {self.name!r}: request schema "
                f"{requests.schema.simpleString()} != contract "
                f"{self.input_schema.simpleString()}"
            )
        q = self._query_with_params(parameters)
        return self._run_request_on(q, requests, history)

    def _serving_history(self, history: Optional[DataFrame]) -> DataFrame:
        """Stored history for request-mode serving — TTL-filtered like every
        other online read (the reference's online storage GCs expired rows
        before serving sees them, so batch and request mode agree).

        DEPLOY-derived absolute indexes (``Engine._auto_index``) additionally
        bound THIS deployment's serving reads: the reference's storage
        iterator skips abs-expired rows on the deployed access path while
        other indexes still serve them, so the filter lives here rather than
        in the table-wide ``_with_ttl``. Applied only when the deployment's
        windows resolve to ONE deploy index — with several, per-path expiry
        cannot be expressed as a single history filter (conservative: skip)."""
        if history is not None:
            return history
        eng = self.engine
        db, bare = eng._loc(self.request_table)
        df = eng._with_ttl(db, bare, eng.tables[self.request_table])
        td = eng._db_defs.get(db, {}).get(bare)
        if td is None:
            return df
        wants = set()
        for w in self.query.body.windows.values():
            keys = frozenset(
                toks[-1].text
                for toks in ([t for t in k if t.kind == "name"] for k in w.partition_by)
                if toks
            )
            onames = [t.text for t in (w.order_by or []) if t.kind == "name"]
            if keys and onames:
                wants.add((keys, onames[-1]))
        dep_idx = [
            i
            for i in td.indexes
            if i.origin == "deploy"
            and i.ttl
            and i.ts_col
            and (frozenset(i.keys), i.ts_col) in wants
        ]
        if len(dep_idx) == 1:
            from openmldb_spark.catalog import apply_ttl

            now = eng.variables.get("ttl_now_ms")
            df = apply_ttl(df, dep_idx[0], now_ms=int(now) if now else None)
        return df

    def _history_from_ref(self, body: "P.Select") -> "P.TableRef":
        """FROM ref binding ``__history`` through the deployed query's own
        FROM pipeline: a subquery FROM (``FROM (SELECT ... FROM t) x``)
        filters/projects history exactly as it does the request rows, so
        frames never see rows the subquery excludes."""
        if body.from_.subquery is None:
            return P.TableRef(
                name="__history", alias=body.from_.alias or body.from_.name
            )
        ref = copy.deepcopy(body.from_)
        sel = ref.subquery.body
        while (
            isinstance(sel, P.Select)
            and sel.from_ is not None
            and sel.from_.name is None
            and sel.from_.subquery is not None
        ):
            sel = sel.from_.subquery.body
        if not sel.from_.alias:
            sel.from_.alias = sel.from_.name
        sel.from_.name = "__history"
        return ref

    def _run_request_on(
        self,
        q: "P.Query",
        requests: DataFrame,
        history: Optional[DataFrame] = None,
    ) -> DataFrame:
        hist = self._serving_history(history)
        body = q.body
        hist_from = self._history_from_ref(body)
        if body.joins or body.where is not None:
            # the window runs over the POST-join/filter relation (batch =
            # join then window), so the history side must flow through the
            # same joins/filters for schemas and semantics to line up
            hist_sel = P.Select(
                items=[P.SelectItem([], None, star=True)],
                from_=hist_from,
                joins=copy.deepcopy(body.joins),
                where=copy.deepcopy(body.where),
            )
            union_ref = P.TableRef(subquery=P.Query(hist_sel))
        elif hist_from.subquery is not None:
            union_ref = hist_from
        else:
            union_ref = P.TableRef(name="__history")
        for w in body.windows.values():
            w.union_tables.append(copy.deepcopy(union_ref))
            w.instance_not_in_window = True
        tables = self.engine._table_view()
        tables[self.request_table] = requests
        tables["__history"] = hist
        return Lowerer(self.engine.spark, tables).query(q, {})

    # -- batch-request common-column optimization (SURVEY §4.1) -------------
    def _item_out_name(self, it) -> str:
        from openmldb_spark.sql.lowering import _derived_name

        return it.alias or _derived_name(it.expr)

    def _item_cols(self, body, it) -> set:
        """Request-table columns an item's computation depends on: its expr
        tokens plus, for window items, the window's keys/order and the
        aggregate arguments."""
        req_cols = (
            {f.name for f in self.input_schema.fields}
            if self.input_schema is not None
            else set()
        )
        toks = list(it.expr)
        if it.over is not None:
            for a in it.over.args:
                toks += list(a)
            w = body.windows.get(it.over.window)
            if w is not None:
                for p in w.partition_by:
                    toks += list(p)
                if w.order_by:
                    toks += list(w.order_by)
        return {t.text for t in toks if t.kind == "name" and t.text in req_cols}

    def run_batch_request(
        self,
        requests: DataFrame,
        common_columns: Sequence[str],
        history: Optional[DataFrame] = None,
    ) -> DataFrame:
        """Request-batch execution with the reference's common-column
        optimization (``hybridse/src/vm/batch_request_optimize.h:40-56``,
        ``test_batch_request.yaml``): ``common_columns`` are constant across
        the batch, so every select item whose inputs (expr + its window's
        keys/order/aggregate args) are all common produces the SAME value
        for every request row. Those items are computed ONCE on a single
        representative row and broadcast-joined back; only the non-common
        items run over the full batch.

        At scale this turns a batch of B requests sharing an expensive
        window into 1 window evaluation + a broadcast of its scalar
        outputs, instead of B frame evaluations — exactly the reference's
        BatchRequestOptimize contract. Falls back to the plain vectorized
        request path when nothing (or everything) is common.
        """
        common = set(common_columns)
        body = self.query.body
        if not common:
            return self.run_request(requests, history)

        cls = self._classify_common(common)
        if cls is None:
            return self.run_request(requests, history)
        common_idx, noncommon_idx = cls

        if not common_idx:
            return self.run_request(requests, history)

        names = [self._item_out_name(it) for it in body.items]

        def sub_query(keep: list) -> "P.Query":
            q = self._query_with_params(None)
            q.body.items = [q.body.items[i] for i in keep]
            return q

        one = requests.limit(1)
        common_df = self._run_request_on(sub_query(common_idx), one, history)
        if not noncommon_idx:
            out = requests.select().crossJoin(F.broadcast(common_df))
        else:
            non_df = self._run_request_on(
                sub_query(noncommon_idx), requests, history
            )
            out = non_df.crossJoin(F.broadcast(common_df))
        return out.select(*names)

    def _classify_common(
        self, common: set
    ) -> Optional[tuple[list[int], list[int]]]:
        """Classify select items under the batch-request optimizer's rules
        (``hybridse/src/vm/batch_request_optimize.h:40-56``): returns
        ``(common_item_indices, noncommon_item_indices)``, or ``None`` when
        the whole batch must fall back to per-row execution (the WHERE
        verdict depends on a non-common request column). Also the source of
        the OUTPUT-side constant flags the reference's procedure/deployment
        serving surface reports (``sdk::Schema::IsConstant``): an output is
        constant iff its item classifies common here."""
        body = self.query.body
        req_cols_all = (
            {f.name for f in self.input_schema.fields}
            if self.input_schema is not None
            else set()
        )
        where_req = {
            t.text
            for t in (body.where or [])
            if t.kind == "name" and t.text in req_cols_all
        }
        if not where_req <= common:
            # the WHERE verdict depends on non-common request columns, so
            # row survival — and with it every item value — is per-row;
            # a single representative row cannot stand in for the batch
            return None

        # columns the right sides of joins contribute (not request columns):
        # common only if every request-side join input is common —
        # otherwise the joined-in values are per-row (conservative: one
        # non-common join input makes ALL joined columns non-common)
        join_common = True
        join_right_names: set = set()
        req_cols = (
            {f.name for f in self.input_schema.fields}
            if self.input_schema is not None
            else set()
        )
        join_aliases: set = set()
        for j in body.joins:
            jtoks = list(j.on or [])
            for ob in j.order_by or []:
                jtoks += list(ob)
            need = {t.text for t in jtoks if t.kind == "name" and t.text in req_cols}
            if not need <= common:
                join_common = False
            rdf = self.engine.tables.get(j.table.name) if j.table.name else None
            if rdf is not None:
                join_right_names |= set(rdf.columns)
            if j.table.alias:
                join_aliases.add(j.table.alias)
            if j.table.name:
                join_aliases.add(j.table.name)

        def _refs_join_side(toks_seq) -> bool:
            """True if a token stream references the join side: a bare name
            that only the right side defines, or any alias-qualified ref
            ``t1.c`` whose qualifier names a join table — the latter catches
            right-side columns that SHADOW a request-column name (bare-name
            set difference would miss them)."""
            toks = list(toks_seq)
            names = {t.text for t in toks if t.kind == "name"}
            if names & (join_right_names - req_cols):
                return True
            for k, t in enumerate(toks):
                if (
                    t.kind == "name"
                    and t.text in join_aliases
                    and k + 2 < len(toks)
                    and toks[k + 1].text == "."
                    and toks[k + 2].kind == "name"
                ):
                    return True
            return False

        common_idx, noncommon_idx = [], []
        for idx, it in enumerate(body.items):
            if it.star:
                noncommon_idx.append(idx)
                continue
            cols = self._item_cols(body, it)
            uses_join_col = _refs_join_side(it.expr)
            if it.over is not None:
                # a window item may aggregate joined-in columns
                for a in it.over.args:
                    uses_join_col |= _refs_join_side(a)
            ok = cols <= common and (not uses_join_col or join_common)
            (common_idx if ok else noncommon_idx).append(idx)

        return common_idx, noncommon_idx

    _LW_AGGS = ("sum", "count", "avg", "min", "max")
    _LW_WHERE_AGGS = tuple(f"{a}_where" for a in _LW_AGGS)

    @staticmethod
    def _lw_where_cond(cond_tokens) -> tuple[str, str, str]:
        """Long-window ``*_where`` conditions are restricted to
        ``<column> <op> <constant>`` (the reference's filter-keyed pre-agg,
        ``aggregator.cc``): returns (filter column, op, literal)."""
        toks = [t for t in cond_tokens]
        _OPS = ("=", "==", "!=", "<", "<=", ">", ">=")
        if (
            len(toks) == 4
            and toks[2].text == "-"
            and toks[3].kind == "num"
        ):
            # fold unary minus: <col> <op> - <num>
            toks = toks[:2] + [P.Tok("num", "-" + toks[3].text)]
        if (
            len(toks) == 3
            and toks[0].kind == "name"
            and toks[1].text in _OPS
            and toks[2].kind in ("num", "str")
        ):
            op = "=" if toks[1].text == "==" else toks[1].text
            return toks[0].text, op, toks[2].text
        raise ValueError(
            "long-window *_where condition must be <column> <op> <constant>"
        )

    def _lw_items(self):
        """(item_idx, window_name, agg, value_sql, cond_tokens|None) for
        each eligible long-window select item; raises if an opted-in window
        is used in a non-eligible way. ``*_where`` aggregates carry their
        condition tokens (filter-keyed pre-agg)."""
        from openmldb_spark.sql.rewrite import rewrite_expr
        from openmldb_spark.sql.parser import render

        body = self.query.body
        out = []
        for idx, it in enumerate(body.items):
            if it.over is None or it.over.window not in self.long_windows:
                continue
            w = body.windows[it.over.window]
            is_where = it.over.func in self._LW_WHERE_AGGS
            ok_fn = (
                it.over.func in self._LW_AGGS and len(it.over.args) == 1
            ) or (is_where and len(it.over.args) == 2)
            if (
                w.frame_kind != "rows_range"
                or w.union_tables
                or w.maxsize is not None
                or w.exclude_current_row
                or w.exclude_current_time
                or not ok_fn
            ):
                raise ValueError(
                    f"window {it.over.window!r} is not long-window eligible "
                    f"(need plain ROWS_RANGE + single "
                    f"sum/count/avg/min/max[_where])"
                )
            cond = None
            if is_where:
                cond = it.over.args[1]
                self._lw_where_cond(cond)  # validate the restricted shape
            out.append(
                (idx, it.over.window, it.over.func,
                 rewrite_expr(it.over.args[0]), cond)
            )
        return out

    def prepare_preagg(self, history: Optional[DataFrame] = None) -> None:
        """Materialize per-(key, bucket) partial aggregates for every
        long-window (agg-input) pair. At scale: persist these to storage
        and refresh incrementally; here they are cached DataFrames."""
        from openmldb_spark.operators.window import parse_interval_ms
        from openmldb_spark.plans.longwindow import preaggregate
        from openmldb_spark.sql.rewrite import _t_bigint, rewrite_expr

        hist = self._serving_history(history)
        body = self.query.body
        # partition keys may be qualified (`PARTITION BY t0.c1`): resolve
        # them against the main-table alias and store under safe flat names
        bind = body.from_.alias or self.request_table
        hist = hist.alias(bind)
        for _, wname, _, val_sql, cond in self._lw_items():
            fcol = self._lw_where_cond(cond)[0] if cond is not None else None
            key = (wname, val_sql, fcol)
            if key in self._preagg:
                continue
            w = body.windows[wname]
            keys = [P.render(p) for p in w.partition_by]
            knames = [f"__lwk{i}" for i in range(len(keys))]
            ord_sql = rewrite_expr(w.order_by)
            bucket_ms = parse_interval_ms(self.long_windows[wname])
            sel = [
                *[F.expr(k).alias(kn) for k, kn in zip(keys, knames)],
                F.expr(_t_bigint(ord_sql)).alias("__lw_ts"),
                F.expr(val_sql).alias("__lw_v"),
            ]
            if fcol is not None:
                sel.append(F.expr(fcol).alias("__lw_f"))
            prepared = hist.select(*sel)
            pre = preaggregate(
                prepared, knames, "__lw_ts", "__lw_v", bucket_ms,
                filter_col="__lw_f" if fcol is not None else None,
            )
            self._preagg[key] = pre.persist()

    def run_request_preagg(self, requests: DataFrame, history: Optional[DataFrame] = None) -> DataFrame:
        """Request mode served from pre-agg buckets + edge scans. Every
        window item must be long-window eligible (the mixed case falls back
        to :meth:`run_request`)."""
        from openmldb_spark.operators.window import parse_interval_ms
        from openmldb_spark.plans.longwindow import request_long_window
        from openmldb_spark.sql.lowering import _derived_name
        from openmldb_spark.sql.rewrite import _t_bigint, rewrite_expr

        body = self.query.body
        lw = {idx: rest for idx, *rest in self._lw_items()}
        n_window_items = sum(1 for it in body.items if it.over is not None)
        if len(lw) != n_window_items or body.joins or body.where is not None:
            return self.run_request(requests, history)
        self.prepare_preagg(history)
        hist = self._serving_history(history)

        bind = body.from_.alias or self.request_table
        hist = hist.alias(bind)
        work = requests.withColumn(
            "__lw_rid", F.monotonically_increasing_id()
        ).alias(bind)
        out_cols: list = []
        for idx, it in enumerate(body.items):
            pretty = it.alias or _derived_name(it.expr)
            if idx not in lw:
                out_cols.append((pretty, F.expr(rewrite_expr(it.expr))))
                continue
            wname, agg, val_sql, cond = lw[idx]
            w = body.windows[wname]
            keys = [P.render(p) for p in w.partition_by]
            knames = [f"__lwk{i}" for i in range(len(keys))]
            ord_sql = rewrite_expr(w.order_by)
            bucket_ms = parse_interval_ms(self.long_windows[wname])
            range_ms = parse_interval_ms(w.lower[1]) if w.lower[0] == "preceding" else None
            if range_ms is None:
                raise ValueError("long windows need a bounded ROWS_RANGE frame")
            # *_where serving (filter-keyed pre-agg): full buckets filter on
            # the stored filter value, the raw edge scan filters on the
            # actual condition, and the request row's own value folds in
            # only when it satisfies the condition
            fcol = cond_sql = None
            if cond is not None:
                fcol, fop, flit = self._lw_where_cond(cond)
                cond_sql = rewrite_expr(cond)
            prepared_hist = hist.select(
                *[F.expr(k).alias(kn) for k, kn in zip(keys, knames)],
                F.expr(_t_bigint(ord_sql)).alias("__lw_ts"),
                F.expr(val_sql).alias("__lw_v"),
                *([F.expr(cond_sql).alias("__lw_ok")] if cond_sql else []),
            )
            pre = self._preagg[(wname, val_sql, fcol)]
            if cond_sql:
                prepared_hist = prepared_hist.filter(F.col("__lw_ok")).drop("__lw_ok")
                pre = pre.filter(F.expr(f"__fv {fop} {flit}"))
            req = work.select(
                "__lw_rid",
                *[F.expr(k).alias(kn) for k, kn in zip(keys, knames)],
                F.expr(_t_bigint(ord_sql)).alias("__lw_ts"),
            )
            scored = request_long_window(
                req,
                prepared_hist,
                pre,
                knames,
                "__lw_ts",
                "__lw_v",
                range_ms=range_ms,
                bucket_ms=bucket_ms,
                agg="raw",
                request_id="__lw_rid",
            ).select(
                "__lw_rid",
                F.col("agg_sum").alias(f"__lw_s{idx}"),
                F.col("agg_cnt").alias(f"__lw_c{idx}"),
                F.col("agg_min").alias(f"__lw_mn{idx}"),
                F.col("agg_max").alias(f"__lw_mx{idx}"),
            )
            work = work.join(scored, "__lw_rid")
            # request-mode frame = history rows in range + the request row
            # itself (RequestUnion merge) — fold the request value in
            v = F.expr(val_sql)
            if cond_sql:
                v = F.when(F.expr(cond_sql), v)
            s_h, c_h = F.col(f"__lw_s{idx}"), F.col(f"__lw_c{idx}")
            mn_h, mx_h = F.col(f"__lw_mn{idx}"), F.col(f"__lw_mx{idx}")
            # typed zeros (v*0 / s_h*0) keep the value column's native type
            # through the combine, so sum over an integer column returns the
            # same dtype as run_batch (double literals silently widened)
            s = F.when(
                v.isNotNull() | s_h.isNotNull(),
                F.coalesce(s_h, v * 0) + F.coalesce(v, s_h * 0),
            )
            c = c_h + F.when(v.isNotNull(), F.lit(1)).otherwise(F.lit(0))
            agg = agg.removesuffix("_where")
            if agg == "sum":
                col = s
            elif agg == "count":
                col = c
            elif agg == "avg":
                col = F.when(c > 0, s / c)
            elif agg == "min":
                col = F.least(mn_h, v)
            else:
                col = F.greatest(mx_h, v)
            out_cols.append((pretty, col))
        return work.select(*[c.alias(n) for n, c in out_cols])

    def as_deployment(self) -> Deployment:
        """Adapter to the callable-based deploy registry."""
        return Deployment(
            self.name,
            lambda req, hist: self.run_request(req, hist),
            self.input_schema,
        )


# -- token helpers -----------------------------------------------------------


#: statement words that can precede/be a name token without declaring an
#: alias — used by _declared_aliases to avoid reading keywords as aliases
_ALIAS_STOPWORDS = {
    "SELECT", "FROM", "WHERE", "GROUP", "BY", "HAVING", "WINDOW", "LIMIT",
    "UNION", "ALL", "DISTINCT", "ORDER", "ON", "LAST", "LEFT", "RIGHT",
    "INNER", "JOIN", "CONFIG", "ROWS", "ROWS_RANGE", "PARTITION", "EXCEPT",
    "INTERSECT", "AND", "OR", "NOT", "XOR", "IN", "BETWEEN", "LIKE",
    "ILIKE", "RLIKE", "IS", "NULL", "TRUE", "FALSE", "CASE", "WHEN",
    "THEN", "ELSE", "END", "CAST", "AS", "OVER", "INTERVAL", "DAY",
    "HOUR", "MINUTE", "SECOND", "ESCAPE", "DIV", "MOD", "DESC", "ASC",
    "PRECEDING", "FOLLOWING", "CURRENT", "CURRENT_ROW", "CURRENT_TIME",
    "UNBOUNDED", "OPEN", "MAXSIZE", "EXCLUDE", "INSTANCE_NOT_IN_WINDOW",
    "INTO", "OUTFILE", "OPTIONS", "VALUES", "TABLE", "INDEX", "KEY", "TS",
    "TTL", "TTL_TYPE",
}


def _like_to_regex(pattern: str) -> str:
    """SQL LIKE pattern -> anchored-regex body (% -> .*, _ -> .)."""
    out = []
    for ch in pattern:
        if ch == "%":
            out.append(".*")
        elif ch == "_":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return "".join(out)


def _infer_fmt(path: str) -> str:
    """Offline-path format when the table has none recorded yet: by
    extension, else the LOAD DATA default (csv)."""
    p = path.rstrip("/").lower()
    for fmt in ("parquet", "json", "tsv"):
        if p.endswith("." + fmt):
            return fmt
    return "csv"


def _declared_aliases(toks: list[Tok]) -> set[str]:
    """Names declared as table/subquery/column aliases in a token stream:
    a name after AS, or a name directly following another name / ')' in an
    alias position (``FROM t d``, ``) d``). Over-detection is safe — it only
    widens the set of qualifiers _mangle_sql leaves alone, and a genuine
    db-qualified ref never has its db token in alias position."""
    out: set[str] = set()
    for k in range(1, len(toks)):
        t = toks[k]
        if t.kind != "name" or t.upper in _ALIAS_STOPWORDS:
            continue
        prev = toks[k - 1]
        if prev.kind == "name" and prev.upper == "AS":
            out.add(t.text)
            continue
        if prev.text == ")" or (
            prev.kind == "name" and prev.upper not in _ALIAS_STOPWORDS
        ):
            nxt = toks[k + 1] if k + 1 < len(toks) else None
            if nxt is not None and nxt.text in ("(", "."):
                continue  # function call / qualifier, not an alias
            out.add(t.text)
    return out


def _split_commas(toks: list[Tok], angles: bool = False) -> list[list[Tok]]:
    """Split on top-level commas. ``angles=True`` additionally treats
    ``<...>`` as nesting — for CREATE TABLE bodies, where MAP<K, V> column
    types carry commas (never for expression lists, where ``<`` compares)."""
    out: list[list[Tok]] = []
    cur: list[Tok] = []
    depth = 0
    for t in toks:
        if t.text in "([" or (angles and t.text == "<"):
            depth += 1
        elif t.text in ")]" or (angles and t.text == ">"):
            depth -= 1
        if t.text == "," and depth == 0:
            out.append(cur)
            cur = []
        else:
            cur.append(t)
    if cur:
        out.append(cur)
    return out


def _parse_coltype(item: list[Tok], k: int) -> tuple[str, int]:
    """Column type at item[k:] -> (Spark DDL type, next index). Handles the
    reference's composite types (cases/plan/create.yaml id 35,
    map_data_type): ARRAY<T> / MAP<K, V>, arbitrarily nested."""
    if k >= len(item):
        raise ValueError("unterminated composite column type")
    base = item[k].text.strip("`").lower()
    if base in ("array", "map") and k + 1 < len(item) and item[k + 1].text == "<":
        t1, k = _parse_coltype(item, k + 2)
        if base == "map":
            if k >= len(item) or item[k].text != ",":
                raise ValueError("MAP<K, V> expected")
            t2, k = _parse_coltype(item, k + 1)
            if k >= len(item) or item[k].text != ">":
                raise ValueError("unterminated MAP<...> type")
            return f"map<{t1},{t2}>", k + 1
        if k >= len(item) or item[k].text != ">":
            raise ValueError("unterminated ARRAY<...> type")
        return f"array<{t1}>", k + 1
    t = _TYPES.get(base)
    if t is None:
        raise ValueError(f"unknown column type {item[k].text!r}")
    return t, k + 1


def _match_paren(toks: list[Tok], i: int) -> int:
    depth = 0
    for j in range(i, len(toks)):
        if toks[j].text == "(":
            depth += 1
        elif toks[j].text == ")":
            depth -= 1
            if depth == 0:
                return j
    raise ValueError("unbalanced parens")


def _literal(toks: list[Tok]):
    if len(toks) == 2 and toks[0].text == "-" and toks[1].kind == "num":
        toks = [Tok("num", "-" + toks[1].text)]
    if len(toks) != 1:
        raise ValueError(f"unsupported literal: {render(toks)}")
    t = toks[0]
    if t.kind == "str":
        return t.text[1:-1]
    if t.kind == "num":
        txt = t.text
        # dialect literal suffixes: 123L (long), 1.5f (float)
        if txt[-1] in "Ll" and txt[:-1].lstrip("-").isdigit():
            return int(txt[:-1])
        if txt[-1] in "Ff" and txt[:-1].replace(".", "", 1).lstrip("-").isdigit():
            return float(txt[:-1])
        return float(txt) if ("." in txt or "e" in txt.lower()) else int(txt)
    u = t.upper
    if u == "NULL":
        return None
    if u == "TRUE":
        return True
    if u == "FALSE":
        return False
    raise ValueError(f"unsupported literal {t.text!r}")


def _coerce(v, dtype):
    """INSERT literal -> python value for the declared column type (the
    dialect writes timestamps as ms-epoch ints or 'Y-m-d H:M:S' strings)."""
    from datetime import date, datetime, timezone

    from pyspark.sql.types import DateType, TimestampNTZType, TimestampType

    if v is None:
        return None
    if isinstance(dtype, (TimestampType, TimestampNTZType)):
        if isinstance(v, (int, float)):
            return datetime.fromtimestamp(v / 1000.0, tz=timezone.utc).replace(tzinfo=None)
        return datetime.fromisoformat(str(v))
    if isinstance(dtype, DateType):
        return date.fromisoformat(str(v)) if not isinstance(v, date) else v
    return v


def _split_statements(script: str) -> list[str]:
    """Split on ';' outside string literals / comments."""
    stmts, cur, i, n = [], [], 0, len(script)
    while i < n:
        c = script[i]
        if c in "'\"":
            j = i + 1
            while j < n and (script[j] != c or script[j - 1] == "\\"):
                j += 1
            cur.append(script[i : j + 1])
            i = j + 1
            continue
        if c == "-" and script[i : i + 2] == "--":
            j = script.find("\n", i)
            i = n if j < 0 else j
            continue
        if c == ";":
            s = "".join(cur).strip()
            if s:
                stmts.append(s)
            cur = []
            i += 1
            continue
        cur.append(c)
        i += 1
    s = "".join(cur).strip()
    if s:
        stmts.append(s)
    return stmts


def _parse_options(opts_s: str, quoted: Optional[set] = None) -> dict[str, str]:
    """Option keys are case-insensitive; VALUES keep their original case —
    null_value='NULL', a quote char, or a path are case-significant.
    Keyword-valued options (mode/format/header) lowercase at the consumer.
    ``quoted`` (if given) collects keys whose value was a quoted string —
    the reference type-checks option values (header must be an unquoted
    bool literal; test_out_in id 13)."""
    parts: list[str] = []
    cur: list[str] = []
    q: Optional[str] = None
    for ch in opts_s:
        if q:
            cur.append(ch)
            if ch == q:
                q = None
        elif ch in "'\"":
            q = ch
            cur.append(ch)
        elif ch == ",":
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    opts: dict[str, str] = {}
    for part in parts:
        if "=" not in part:
            continue
        k, v = part.split("=", 1)
        k, v = k.strip().lower(), v.strip()
        if quoted is not None and len(v) >= 2 and v[0] in "'\"" and v[-1] == v[0]:
            quoted.add(k)
        opts[k] = v.strip("'\"")
    return opts


#: option keys the reference's LOAD DATA / SELECT INTO accept
#: (LOAD_DATA_STATEMENT.md:53-66 / SELECT_INTO_STATEMENT.md) — unknown
#: keys are rejected (test_out_in id 12)
#: SET-able system variables: the reference's supported set
#: (SET_STATEMENT.md) plus this repo's ttl_now_ms extension (pins "now"
#: for deterministic TTL tests)
_KNOWN_VARIABLES = {
    "execute_mode",
    "enable_trace",
    "sync_job",
    "sync_timeout",
    "job_timeout",
    "spark_config",
    "insert_memory_usage_limit",
    "ttl_now_ms",
}

_LOAD_OPTS = {"format", "delimiter", "header", "null_value", "quote", "mode", "deep_copy", "load_mode", "thread"}
_OUTFILE_OPTS = {"format", "delimiter", "header", "null_value", "quote", "mode", "coalesce"}
_BOOL_OPTS = {"header", "deep_copy"}


def _check_options(opts: dict, quoted: set, allowed: set, what: str) -> None:
    for k in opts:
        if k not in allowed:
            raise ValueError(f"unknown {what} option {k!r}")
        if k in _BOOL_OPTS:
            if k in quoted or opts[k].lower() not in ("true", "false"):
                raise ValueError(
                    f"{what} option {k!r} must be an unquoted bool literal"
                )
