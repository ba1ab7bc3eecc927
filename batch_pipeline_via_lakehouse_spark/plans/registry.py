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


def load_wide(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """``load`` + guaranteed scan-side parallelism for CPU-heavy per-row work.

    A parquet split can never be finer than a row group, and the test corpus
    files are written as ONE row group — so a scan feeding an expensive
    projection (regexp split, per-shingle md5, NumPy UDFs) runs its entire
    map side in 1-2 tasks regardless of cores. For those operators a cheap
    round-robin exchange of the raw (small) input re-establishes
    parallelism = defaultParallelism (guide §2.5 "input skew: one huge
    unsplittable file ... repartition immediately after the read").

    Gated: when the scan already yields >= defaultParallelism splits (the
    100 TB shape — thousands of row groups), this is a no-op, so the extra
    exchange is never paid where the scan is already wide. Deterministic
    filters still push through the exchange to the parquet scan
    (PushPredicateThroughNonJoin handles RepartitionOperation)."""
    df = load(spark, sf_dir, table)
    n = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < n:
        df = df.repartition(n)
    return df
