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
from pyspark.sql import functions as F


_MODES = {"overwrite": "overwrite", "append": "append", "error_if_exists": "error", "errorifexists": "error"}


def _parse_ddl(schema: str) -> list[tuple[str, str]]:
    # split on top-level commas only: parameterized types such as
    # decimal(10,2) / varchar(20) carry commas inside parens
    out, depth, start = [], 0, 0
    parts: list[str] = []
    for i, ch in enumerate(schema):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(schema[start:i])
            start = i + 1
    parts.append(schema[start:])
    for part in parts:
        name, typ = part.strip().split(None, 1)
        out.append((name.strip("`"), typ.strip()))
    return out


def _split_by_first_line(
    path: str, names: list[str], sep: str, quote: str
) -> tuple[list[str], list[str]]:
    """Classify the csv files under ``path`` by whether their first line
    content-matches the expected header ``names``. Local-FS driver-side
    listing (this sandbox's only FS); a real deployment swaps in the
    Hadoop FileSystem API the same way Spark's own file index does."""
    import os

    p = path[len("file://"):] if path.startswith("file://") else path
    files = []
    if os.path.isdir(p):
        for root, _dirs, fnames in os.walk(p):
            files.extend(
                os.path.join(root, f)
                for f in fnames
                if not f.startswith((".", "_"))
            )
    else:
        files = [p]
    hdr, data = [], []
    for f in sorted(files):
        with open(f, "r", errors="replace") as fh:
            first = fh.readline().rstrip("\r\n")
        toks = [t.strip().strip(quote) if quote else t.strip() for t in first.split(sep)]
        (hdr if toks == names else data).append(f)
    return hdr, data


def _strict_csv(
    spark: SparkSession,
    path: str,
    schema: str,
    *,
    sep: str,
    header: bool,
    null_value: str,
    quote: str,
) -> DataFrame:
    """Schema-known CSV read with the reference's LOAD DATA strictness:

    - a malformed value (non-castable cell) FAILS the load, it does not
      silently become NULL (reference rejects type mismatches);
    - ``header=true`` strips a file's first line ONLY when it
      content-matches the table's column names — the behavior the
      reference's ONLINE importer exhibits (test_select_into_load_data
      id 9-1: a header-less ``mode='append'`` part keeps ALL its data
      rows). Files are classified on the DRIVER by their first line (one
      tiny read per part — an import job lists its files anyway), which
      is deterministic across plan re-evaluations (an earlier
      ``monotonically_increasing_id`` per-file-min join broke when later
      plans re-packed the small files differently). A data row that
      merely LOOKS like the header mid-file is always kept. The
      reference's OFFLINE (plain Spark) path instead blind-drops the
      first row per part — silently eating a data row from header-less
      parts; the reference corpus itself tags that as a quirk (id 9-2
      "导入缺一行"), and this engine refuses to reproduce it: the
      affected golden ids are excluded with annotations (DIVERGENCES
      #19).
    """
    cols = _parse_ddl(schema)
    probe = (
        spark.read.option("sep", sep)
        .option("header", "false")
        .option("quote", quote)
        .csv(path)
    )
    if len(probe.columns) != len(cols):
        raise ValueError(
            f"LOAD DATA: file has {len(probe.columns)} columns, "
            f"table expects {len(cols)}"
        )
    rc = probe.columns
    str_schema = ", ".join(f"`{c}` string" for c in rc)

    def _read(paths, with_header: bool) -> DataFrame:
        return (
            spark.read.option("sep", sep)
            .option("header", str(with_header).lower())
            .option("nullValue", null_value)
            .option("quote", quote)
            .schema(str_schema)
            .csv(paths)
        )

    if header:
        names = [n for n, _ in cols]
        hdr_files, data_files = _split_by_first_line(path, names, sep, quote)
        if hdr_files and data_files:
            raw = _read(hdr_files, True).unionByName(_read(data_files, False))
        elif data_files:
            raw = _read(data_files, False)
        else:
            raw = _read(hdr_files or path, True)
    else:
        raw = _read(path, header)
    proj = []
    for c, (name, typ) in zip(rc, cols):
        lt = typ.lower()
        if lt in ("string", "varchar"):
            proj.append(F.col(c).alias(name))
            continue
        if lt == "timestamp":
            # reference CSV timestamps come as EITHER epoch-ms int64 OR
            # datetime strings (LOAD_DATA_STATEMENT.md "CSV Source Data
            # Format" #3); accept both, per value
            ms = F.expr(f"try_cast(`{c}` AS BIGINT)")
            cast = F.when(ms.isNotNull(), F.timestamp_millis(ms)).otherwise(
                F.expr(f"try_cast(`{c}` AS TIMESTAMP)")
            )
        else:
            cast = F.try_cast(F.col(c), typ) if hasattr(F, "try_cast") else F.col(c).cast(typ)
        bad = F.col(c).isNotNull() & cast.isNull()
        proj.append(
            F.when(
                bad,
                F.raise_error(
                    F.concat(
                        F.lit(f"LOAD DATA: value '"),
                        F.col(c),
                        F.lit(f"' is not a valid {typ} for column {name}"),
                    )
                ).cast(typ),
            )
            .otherwise(cast)
            .alias(name)
        )
    return raw.select(*proj)


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
        sep = "\t" if fmt == "tsv" else delimiter
        if schema:
            return _strict_csv(
                spark, path, schema,
                sep=sep, header=header, null_value=null_value, quote=quote,
            )
        reader = (
            spark.read.option("sep", sep)
            .option("header", str(header).lower())
            .option("nullValue", null_value)
            .option("quote", quote)
            .option("inferSchema", "true")
        )
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
    if mode.lower() not in _MODES:
        raise ValueError(
            f"invalid mode {mode!r} (error_if_exists/overwrite/append)"
        )
    writer = df.write.mode(_MODES[mode.lower()])
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
            # empty strings must round-trip under THIS quote char: Spark's
            # write default emptyValue is the literal two chars `""`, which
            # a reader with quote='#' keeps as a 2-char string
            # (test_select_into_load_data id 0-1)
            .option("emptyValue", quote * 2 if quote else '""')
            .csv(path)
        )
    else:
        raise ValueError(f"unsupported format {fmt!r}")
