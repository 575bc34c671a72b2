"""SparkSession construction and test-data loading.

Scale notes (100 TB design intent, tested on local[32]):

- AQE on: runtime coalescing, skew-join splitting, dynamic broadcast.
- ``spark.sql.shuffle.partitions`` is a *starting* value; AQE coalesces.
  On a real cluster size it to ~2-3x total executor cores and let AQE trim.
- All timestamps are handled timezone-independently: parquet ms-timestamps
  read as TIMESTAMP_NTZ (Spark 4 default), parquet ns-timestamps read via
  ``spark.sql.legacy.parquet.nanosAsLong`` and converted explicitly.
  Session timezone is pinned to UTC so TimestampType <-> NTZ casts and
  date-part extraction are deterministic regardless of host timezone.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: tables shipped by the test-data generator (TESTDATA.md)
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: columns stored as parquet TIMESTAMP(NANOS) that Spark 4 reads as long
#: (nanoseconds since epoch) under nanosAsLong; we convert to TIMESTAMP_NTZ.
_NANO_TS_COLUMNS = {"events": ("ts",)}


def get_spark(app_name: str = "openmldb_spark", cpus: int | None = None) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` or all local cores.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # the reference dialect is permissive (bad cast / out-of-range -> NULL,
        # see OpenMLDB type docs); ANSI strictness would diverge
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        # JDK17 defaults ReservedCodeCacheSize to 240m; a long bench run
        # compiles ~550 whole-stage-codegen classes and late queries land in
        # a JIT slow tier once the cache fills (the r7-r10 adjudicated bench
        # tier). Spark's build docs recommend 512m+ for codegen-heavy work.
        # Static conf: takes effect only when this call launches the JVM.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=512m",
        )
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def _ensure_session_confs(spark: SparkSession) -> None:
    """Pin runtime confs we rely on, even on a session we didn't build.

    The correctness driver hands us its own SparkSession; these are runtime
    (non-static) SQL confs, so setting them here is safe and effective.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.ansi.enabled", "false")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test-data table, normalizing timestamp columns.

    Nanosecond parquet timestamps arrive as long (ns); convert to
    TIMESTAMP_NTZ truncated to microseconds — the same value DuckDB sees
    when it reads the file, so oracle comparisons are exact.
    """
    _ensure_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for col in _NANO_TS_COLUMNS.get(name, ()):
        if col in df.columns and dict(df.dtypes)[col] == "bigint":
            # integer division: float division loses ms precision at ~1.7e18 ns
            df = df.withColumn(
                col,
                F.timestamp_micros(F.expr(f"{col} div 1000")).cast("timestamp_ntz"),
            )
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLES) -> dict[str, DataFrame]:
    """Load several test-data tables as a dict of DataFrames."""
    return {n: load_table(spark, sf_dir, n) for n in names}
