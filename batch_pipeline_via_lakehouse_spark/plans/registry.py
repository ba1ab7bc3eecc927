"""Query registry: every operator exposed to the driver registers here.

Each entry pairs a Spark DataFrame callable ``(spark, sf_dir) -> DataFrame``
with (when SQL-expressible) an equivalent ANSI-SQL string for the DuckDB
oracle. Conventions that make the driver's order-insensitive value-hash
stable across engines:

- every computed/aggregate column is aliased identically on both sides;
- doubles are ``round(x, 4)`` on both sides;
- timestamps are returned as ``unix_micros``/``epoch_us`` BIGINTs,
  dates as 'yyyy-MM-dd' strings;
- ties in window orderings always get a deterministic tiebreak column.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")
