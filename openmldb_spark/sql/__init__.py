"""SQL front end for the reference dialect.

The reference compiles its SQL with ZetaSQL + HybridSE
(``hybridse/src/planv2/plan_api.cc:105-112``); we parse the same narrow
dialect with a hand-rolled recursive-descent parser (no parser libs in this
environment) and lower to PySpark DataFrame operators:

- statement structure (SELECT / FROM / joins / WINDOW / GROUP BY / UNION /
  WITH / LIMIT) is parsed structurally — see :mod:`.parser`;
- scalar expressions are delegated to Spark SQL via ``F.expr`` after a
  token-level rewrite of dialect-only function names — see :mod:`.rewrite`;
- dialect constructs (LAST JOIN, WINDOW ... UNION, ROWS_RANGE frames,
  MAXSIZE / EXCLUDE / INSTANCE_NOT_IN_WINDOW) lower onto
  :mod:`openmldb_spark.operators` — see :mod:`.lowering`.

Entry point: :func:`sql`.
"""

from openmldb_spark.sql.lowering import sql  # noqa: F401
