"""Deployments and procedures: DEPLOY, auto-indexing, CREATE PROCEDURE, and the SqlDeployment serving object (request mode, batch-request optimization, long-window pre-agg)."""

from __future__ import annotations

import copy  # noqa: F401
import datetime  # noqa: F401
import re  # noqa: F401
from typing import Optional, Sequence  # noqa: F401

from pyspark.sql import DataFrame, SparkSession  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from openmldb_spark.catalog import IndexDef, TableDef  # noqa: F401
from openmldb_spark.jobs import JOB_SCHEMA, JobManager  # noqa: F401
from openmldb_spark.plans.deploy import Deployment  # noqa: F401
from openmldb_spark.sources.loader import load_data, select_into  # noqa: F401
from openmldb_spark.sql import parser as P  # noqa: F401
from openmldb_spark.sql.lowering import Lowerer  # noqa: F401
from openmldb_spark.sql.parser import Tok, render, tokenize  # noqa: F401

from openmldb_spark.engine._helpers import (  # noqa: F401
    _TYPES,
    _ALIAS_STOPWORDS,
    _BOOL_OPTS,
    _KNOWN_VARIABLES,
    _LOAD_OPTS,
    _OUTFILE_OPTS,
    _check_options,
    _coerce,
    _declared_aliases,
    _infer_fmt,
    _like_to_regex,
    _literal,
    _match_paren,
    _parse_coltype,
    _parse_options,
    _split_commas,
    _split_statements,
)


class DeployMixin:

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
        if long_windows:
            # cluster-router deploy-time validation
            # (src/sdk/sql_cluster_router.cc:4477-4480): every long_windows
            # name must be used by a windowed select item. The function-tier
            # corpus golden tolerating unknown names (long_window.yaml ids
            # 13/14) predates this check — resolved toward the cluster
            # behavior (DIVERGENCES #25).
            used = {
                it.over.window
                for it in dep.query.body.items
                if it.over is not None
            }
            if not set(long_windows) <= used:
                raise ValueError(
                    "long_windows option doesn't match window in sql"
                )
            for bucket in long_windows.values():
                # aggregator bucket units are the SINGLE-CHAR s/m/h/d or a
                # bare row count (src/storage/aggregator.cc:1262-1280);
                # anything else — the corpus pins '2y', and the reference
                # also rejects '2min' — fails aggregator creation
                # (integration_test/long_window id 0; r9 ADVICE)
                if not re.fullmatch(r"\d+(s|m|h|d)?", bucket):
                    raise ValueError(
                        f"create aggregator failed: bad bucket size "
                        f"{bucket!r} (want <n>[s|m|h|d])"
                    )
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
        db, dep = self._dep_lookup(name)
        dep._release_preagg()
        del self._db_deps[db][name]
        return None

    def _drop_procedure(self, name: str):
        """DROP PROCEDURE [db.]name — routes pre-mangle (ADVICE r7): the
        qualifier must reach _dep_lookup dotted, like SHOW CREATE
        PROCEDURE (the reference's kCmdDropSp takes [db.]name)."""
        db, dep = self._dep_lookup(name)
        if dep.kind != "procedure":
            raise ValueError(f"procedure {name!r} not found")
        dep._release_preagg()
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
        engine: "Engine",  # the core class; annotation-only (no import cycle)
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
        #: provenance of the cached pre-agg: ("tbl", epoch, ttl_pin) when
        #: built from the engine store, or a STRONG reference to the
        #: explicit history DataFrame (identity-compared; a raw id() could
        #: be reused by a new object after GC — r9 review finding) —
        #: checked on every prepare_preagg so DML invalidates the cache
        self._preagg_src: Optional[tuple] = None
        self._preagg_hist: Optional[DataFrame] = None
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
            if self.long_windows and not isinstance(body, P.Select):
                # the reference rejects long-window deploys over set-op
                # bodies with its own message
                # (src/sdk/sql_cluster_router.cc long-window validation)
                raise ValueError(
                    "unsupported multi tables with long window options"
                )
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

    def _prune_history_to_request_keys(
        self, hist: DataFrame, requests: DataFrame, body: "P.Select"
    ) -> DataFrame:
        """Serving-path analog of the reference's index lookup: a request
        row's frames only ever contain history rows whose window partition
        key equals the request's (the tablet reads ONE pk segment,
        ``src/storage/mem_table.cc`` iterators) — so history is
        pre-filtered with a broadcast join on the DISTINCT request key
        tuples before the window-union plan is built. At sf0.01 this turns
        a ~150k-row scan per request into ~window-size rows; at 100 TB it
        is the difference between serving and a full table scan per call.

        Applied only when provably safe: every window partitions by plain
        request-table columns (no subquery FROM rewiring the columns, no
        join-side shadowing); null keys match null-safely (null-key
        history rows DO share a frame with a null-key request). Zero
        driver actions — the key sides stay DataFrames."""
        import functools

        if body.from_.subquery is not None or not body.windows:
            return hist
        req_cols = set(requests.columns)
        join_cols: set = set()
        for j in body.joins:
            rdf = self.engine.tables.get(j.table.name) if j.table.name else None
            if rdf is None:
                return hist  # unresolvable join side: stay conservative
            join_cols |= set(rdf.columns)
        keysets = set()
        for w in body.windows.values():
            names = []
            for ktoks in w.partition_by:
                toks = list(ktoks)
                # plain column only — `c` or `alias.c`. An EXPRESSION key
                # (c1 % 10, substr(c1, ...)) groups DIFFERENT column
                # values into one frame, so pruning on the operand column
                # would drop frame members (r9 review finding): skip.
                if len(toks) == 1 and toks[0].kind == "name":
                    nm = toks[0].text
                elif (
                    len(toks) == 3
                    and toks[0].kind == "name"
                    and toks[1].text == "."
                    and toks[2].kind == "name"
                ):
                    nm = toks[2].text
                else:
                    return hist
                if nm not in req_cols or nm in join_cols:
                    return hist
                names.append(nm)
            if not names:
                return hist  # an unkeyed window frames over everything
            keysets.add(tuple(sorted(set(names))))
        out, markers = hist, []
        for i, ks in enumerate(sorted(keysets)):
            marker = f"__rq_m{i}"
            kdf = (
                requests.select(*ks).distinct()
                .select(
                    *[F.col(c).alias(f"__rqk{i}_{c}") for c in ks],
                    F.lit(1).alias(marker),
                )
            )
            on = functools.reduce(
                lambda a, b: a & b,
                [F.col(c).eqNullSafe(F.col(f"__rqk{i}_{c}")) for c in ks],
            )
            out = out.join(F.broadcast(kdf), on, "left").drop(
                *[f"__rqk{i}_{c}" for c in ks]
            )
            markers.append(marker)
        keep = functools.reduce(
            lambda a, b: a | b, [F.col(m).isNotNull() for m in markers]
        )
        return out.filter(keep).drop(*markers)

    def _run_request_on(
        self,
        q: "P.Query",
        requests: DataFrame,
        history: Optional[DataFrame] = None,
    ) -> DataFrame:
        hist = self._serving_history(history)
        body = q.body
        hist = self._prune_history_to_request_keys(hist, requests, body)
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
        each PRE-AGG-SERVABLE long-window select item. An opted-in window
        that this engine cannot serve from time buckets — ROWS frame or a
        bare-number (row-count) bucket, WINDOW UNION/MAXSIZE/EXCLUDE attrs,
        a non-sum/count/avg/min/max[_where] function — is skipped, which
        makes :meth:`run_request_preagg` fall back to raw request serving
        (results stay exact; only the pre-agg speedup is lost). The
        reference additionally materializes ROW-COUNT buckets
        (``aggregator.cc`` kRowsNum) — a documented non-goal here
        (DIVERGENCES #25). ``*_where`` aggregates carry their condition
        tokens (filter-keyed pre-agg)."""
        from openmldb_spark.sql.rewrite import rewrite_expr

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
                or self.long_windows[it.over.window].isdigit()
                or w.union_tables
                or w.maxsize is not None
                or w.exclude_current_row
                or w.exclude_current_time
                or not ok_fn
            ):
                continue
            cond = None
            if is_where:
                cond = it.over.args[1]
                try:
                    self._lw_where_cond(cond)  # restricted-shape check
                except ValueError:
                    continue
            out.append(
                (idx, it.over.window, it.over.func,
                 rewrite_expr(it.over.args[0]), cond)
            )
        return out

    def _release_preagg(self) -> None:
        """Unpersist and forget every cached pre-agg DataFrame. Called on
        staleness (epoch/TTL/history change) AND from every drop path —
        DROP DEPLOYMENT / DROP PROCEDURE / DROP TABLE of the request table
        / DROP DATABASE — because a ``del`` alone leaves the ``.persist()``ed
        buckets in the Spark cache until the ContextCleaner happens to
        collect the orphaned JVM refs: non-deterministic memory pressure on
        a serving cluster (r9 verdict #3)."""
        for cached in self._preagg.values():
            cached.unpersist()
        self._preagg.clear()
        self._preagg_src = None
        self._preagg_hist = None

    def prepare_preagg(self, history: Optional[DataFrame] = None) -> None:
        """Materialize per-(key, bucket) partial aggregates for every
        long-window (agg-input) pair. At scale: persist these to storage
        and refresh incrementally; here they are cached DataFrames.

        The cache is epoch-stamped against the request table: any DML on it
        (INSERT/DELETE/LOAD/TRUNCATE) bumps ``Engine.table_epoch`` and the
        next serve rebuilds from live rows — the batch counterpart of the
        reference's maintain-on-every-Put/Delete aggregator
        (``src/storage/aggregator.cc``; integration_test/long_window
        "delete pk" cases pin that a DELETE empties the pre-agg)."""
        from openmldb_spark.operators.window import parse_interval_ms
        from openmldb_spark.plans.longwindow import preaggregate
        from openmldb_spark.sql.rewrite import _t_bigint, rewrite_expr

        if history is not None:
            stale = history is not self._preagg_hist
            src = None
        else:
            src = (
                "tbl",
                # the resolved (db, bare) + execute_mode join the key (r9
                # ADVICE): a USE to another db holding a same-named table,
                # or an online<->offline switch (which changes whether the
                # TTL filter applies in _serving_history), must not serve
                # buckets built from different rows than the live scan
                self.engine._loc(self.request_table),
                self.engine.variables.get("execute_mode", "online"),
                self.engine.table_epoch(self.request_table),
                # the TTL pin also shapes serving history: a SET
                # @@ttl_now_ms between serves must rebuild the buckets
                self.engine.variables.get("ttl_now_ms"),
            )
            stale = self._preagg_hist is not None or src != self._preagg_src
        if stale:
            self._release_preagg()
            self._preagg_src = src
            self._preagg_hist = history
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
