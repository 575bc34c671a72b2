"""Sources & sinks: LOAD DATA INFILE / SELECT INTO OUTFILE equivalents."""

from openmldb_spark.sources.loader import load_data, select_into

__all__ = ["load_data", "select_into"]
