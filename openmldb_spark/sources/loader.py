"""LOAD DATA INFILE / SELECT ... INTO OUTFILE — option-parity readers/writers.

Reference surface: ``docs/en/openmldb_sql/dml/LOAD_DATA_STATEMENT.md:53-66``
(options: format, delimiter, header, null_value, quote, mode, deep_copy) and
``PhysicalSelectIntoNode`` / ``SelectIntoPlan.scala`` for the writer. The
reference's Spark loader (``DataSourceUtil.scala:54-100``) supports
csv/parquet/hive; we map csv/parquet/json directly to Spark readers. Hive /
iceberg-style catalogs resolve through the Spark catalog when configured
(``spark.table(name)``) — no extra code needed here.

Scale: readers return lazy DataFrames — predicate pushdown and column
pruning reach the scan (verify with ``.explain``: PushedFilters/ReadSchema).
``mode`` maps to Spark save modes; ``soft_copy`` (deep_copy=false) is a
no-op for parquet reads (Spark never copies on read).

Documented gaps (unreachable in this environment, by design):

- ``tidb`` / ``iceberg`` LOAD DATA formats (reference
  ``DataSourceUtil.scala:96,152-157``): both resolve through standard Spark
  catalog/JDBC configuration (``spark.read.format("iceberg")`` /
  ``.format("jdbc")``) — connector jars and endpoints, not engine code.
  Tested formats here are csv/tsv/parquet/json/hive.
- Kafka/Pulsar sources: see :mod:`openmldb_spark.streaming` — the
  ``readStream.format("kafka")`` wiring exists but no broker is available
  in this sandbox, so only file-source streams are exercised by tests.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession


_MODES = {"overwrite": "overwrite", "append": "append", "error_if_exists": "error", "errorifexists": "error"}


def load_data(
    spark: SparkSession,
    path: str,
    *,
    fmt: str = "csv",
    delimiter: str = ",",
    header: bool = True,
    null_value: str = "null",
    quote: str = '"',
    schema: Optional[str] = None,
) -> DataFrame:
    """LOAD DATA INFILE 'path' OPTIONS(...) -> DataFrame.

    Option names/defaults mirror LOAD_DATA_STATEMENT.md (delimiter=',',
    header=true, null_value='null', quote='\"').
    """
    fmt = fmt.lower()
    if fmt == "parquet":
        return spark.read.parquet(path)
    if fmt == "json":
        reader = spark.read
        if schema:
            reader = reader.schema(schema)
        return reader.json(path)
    if fmt in ("csv", "tsv"):
        reader = (
            spark.read.option("sep", "\t" if fmt == "tsv" else delimiter)
            .option("header", str(header).lower())
            .option("nullValue", null_value)
            .option("quote", quote)
        )
        if schema:
            reader = reader.schema(schema)
        else:
            reader = reader.option("inferSchema", "true")
        return reader.csv(path)
    if fmt == "hive":
        return spark.table(path)
    raise ValueError(f"unsupported format {fmt!r} (csv/tsv/parquet/json/hive)")


def select_into(
    df: DataFrame,
    path: str,
    *,
    fmt: str = "csv",
    delimiter: str = ",",
    header: bool = True,
    null_value: str = "null",
    quote: str = '"',
    mode: str = "error_if_exists",
    coalesce: Optional[int] = None,
) -> None:
    """SELECT ... INTO OUTFILE 'path' OPTIONS(...).

    ``coalesce`` limits output files (the reference writes one file per
    partition too; pass 1 for a single file at small scale — do NOT at 100 TB).
    """
    if coalesce:
        df = df.coalesce(coalesce)
    writer = df.write.mode(_MODES.get(mode.lower(), mode))
    fmt = fmt.lower()
    if fmt == "parquet":
        writer.parquet(path)
    elif fmt == "json":
        writer.json(path)
    elif fmt in ("csv", "tsv"):
        (
            writer.option("sep", "\t" if fmt == "tsv" else delimiter)
            .option("header", str(header).lower())
            .option("nullValue", null_value)
            .option("quote", quote)
            .csv(path)
        )
    else:
        raise ValueError(f"unsupported format {fmt!r}")
