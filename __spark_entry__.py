"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the engine-native flagship (tokenize documents -> fragmented
token table -> bin-packing compaction -> Z-order clustering -> rollup scan).
``queries``/``oracle_sql`` expose the full operator suite from SURVEY.md §2
plus the training-data operators (dedup sketches, similarity search, text
analysis); each SQL-expressible query carries a DuckDB oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from batch_pipeline_via_lakehouse_spark.plans.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full maintenance pass over a token table built from
    sf0.001 documents; returns the post-maintenance per-source rollup."""
    return QUERIES["maintenance_compact_zorder"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
