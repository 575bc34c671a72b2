"""Function surface: scalar function registry + UDAF library."""

from openmldb_spark.functions import aggregates, scalar

__all__ = ["aggregates", "scalar"]
