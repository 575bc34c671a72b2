"""The compiled request plan — build once per deployment, swap staged
Arrow rows per call (the Spark analog of the reference's per-DEPLOY
compiled-plan cache, ``hybridse/src/vm/engine.cc:453-496``). Split from
:mod:`openmldb_spark.engine.serving` (house <=900-line module bar)."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


#: spark.conf key naming a shared-filesystem directory for staged request
#: batches (the ``Engine(staging_dir=...)`` argument takes precedence)
STAGING_DIR_CONF = "spark.openmldb.serving.stagingDir"


def resolve_staging_dir(master: str, explicit: str | None) -> str | None:
    """Pick the staging root for compiled-plan request batches.

    ``explicit`` (Engine arg or the ``spark.openmldb.serving.stagingDir``
    conf) wins. With no explicit dir, a driver-local tempdir is only
    correct when driver and executors share a filesystem — i.e. local
    mode; on any other master this RAISES instead of silently serving
    empty results when executors fail to open the driver's tempfile. The
    reference has no such gap (request rows travel inside the RPC,
    ``src/sdk/sql_cluster_router.h:116-190``); ours is a file handoff, so
    the cluster contract is enforced here rather than docstring-only.
    """
    if explicit:
        return explicit
    if not master.startswith("local"):
        raise RuntimeError(
            "compiled request serving stages rows in a file that every "
            f"executor must read; spark.master={master!r} is non-local, so "
            "pass Engine(staging_dir=...) or set spark conf "
            f"{STAGING_DIR_CONF!r} to a shared-filesystem path (NFS/EFS/"
            "Lustre) visible to all executors"
        )
    return None


def _staged_reader(path: str):
    """Task-side reader for the compiled plan's request source: yields the
    Arrow batches staged at ``path`` AT EXECUTION TIME — the plan is fixed,
    only the staged file's contents change between calls. Runs as ONE task
    (the source is ``range(0,1,1,1).mapInArrow``); batches are Spark's own
    Arrow encoding of the request rows (``DataFrame.toArrow``), so types
    round-trip exactly. On a cluster the staged path must live on shared
    storage (it is a tiny request batch, not data-sized)."""
    import pyarrow as pa

    def reader(batches):
        for _ in batches:  # drain the 1-row driver source
            pass
        with pa.ipc.open_file(path) as rd:
            for i in range(rd.num_record_batches):
                yield rd.get_batch(i)

    return reader


class CompiledRequestPlan:
    """A deployment's request plan, compiled ONCE and re-served by swapping
    staged request rows — the Spark analog of the reference's per-DEPLOY
    compiled-plan cache (``hybridse/src/vm/engine.cc:453-496``: CompileSql
    caches the physical plan; ``src/sdk/sql_cluster_router.h:116-190``
    CallProcedure binds a request row per call).

    Mechanics, and why each piece is needed:

    - the request source is ``mapInArrow`` over a staged Arrow IPC file:
      executors read the file when the job RUNS, so new rows flow through
      the already-built plan without re-lowering (parse + Lowerer +
      per-intermediate-Dataset Catalyst analysis — ~50% of the uncached
      per-call latency, ``bench_request.py``).
    - each serve returns a FRESH Dataset over the cached ANALYZED plan
      (``.where(lit(True))``): re-collecting the same Dataset would REUSE
      its shuffle map outputs (ShuffleExchangeExec caches its ShuffledRowRDD
      and the DAGScheduler skips registered map stages), silently serving
      the PREVIOUS request's rows. Fresh physical planning per call is the
      correct/fast split: analysis of an already-resolved tree is cheap;
      the Python-side lowering never re-runs.
    - ``key`` (from ``SqlDeployment._serving_key``) pins the engine state
      the plan captured: any DML epoch bump / TTL pin / mode change makes
      ``run_request`` drop and recompile.

    The serve contract is collect-before-next-serve (the returned
    DataFrame reads the staged file at collect time); ``Engine``'s serving
    surfaces collect eagerly. :meth:`serve_rows` additionally holds a lock
    across stage+collect, so concurrent callers (the ThreadingHTTPServer
    RESTful handler routes through it) serialize per deployment instead of
    overwriting each other's staged rows.
    """

    def __init__(self, dep: "SqlDeployment", key: tuple):
        import threading

        self.dep = dep
        self.key = key
        self.spark = dep.engine.spark
        self._lock = threading.Lock()
        root = resolve_staging_dir(
            self.spark.conf.get("spark.master", "local"),
            getattr(dep.engine, "staging_dir", None)
            or self.spark.conf.get(STAGING_DIR_CONF, None),
        )
        if root is not None:
            os.makedirs(root, exist_ok=True)
        self._dir = tempfile.mkdtemp(prefix=f"omsk_req_{dep.name}_", dir=root)
        self._staged = os.path.join(self._dir, "requests.arrow")
        # stage an empty batch so compile-time analysis sees the schema
        self._write_staged(
            self.spark.createDataFrame([], dep.input_schema).toArrow()
        )
        src = self.spark.range(0, 1, numPartitions=1).mapInArrow(
            _staged_reader(self._staged), dep.input_schema
        )
        self.plan = dep._run_request_on(dep._query_with_params(None), src, None)

    def _write_staged(self, table) -> None:
        import pyarrow as pa

        tmp = self._staged + ".tmp"
        with pa.ipc.new_file(tmp, table.schema) as w:
            w.write_table(table)
        os.replace(tmp, self._staged)

    def serve(self, requests: DataFrame) -> DataFrame:
        self._write_staged(requests.toArrow())
        return self.plan.where(F.lit(True))

    def serve_rows(self, rows: list) -> list:
        """Driver-side staging + eager collect: no Spark job other than
        the serve itself. ``LocalDataToArrowConversion`` applies the same
        type checks/coercions as ``createDataFrame`` and emits the same
        Arrow layout ``toArrow`` would, so both staging paths are
        bit-identical on the wire."""
        from pyspark.sql.conversion import LocalDataToArrowConversion

        if not rows:
            return []
        with self._lock:
            self._write_staged(
                LocalDataToArrowConversion.convert(
                    rows, self.dep.input_schema, False
                )
            )
            return self.plan.where(F.lit(True)).collect()

    def release(self) -> None:
        shutil.rmtree(self._dir, ignore_errors=True)
