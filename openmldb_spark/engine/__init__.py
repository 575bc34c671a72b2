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

from openmldb_spark.engine.core import Engine, _NsView, _TTLView  # noqa: F401
from openmldb_spark.engine.deploy import SqlDeployment  # noqa: F401
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

__all__ = ["Engine", "SqlDeployment"]
