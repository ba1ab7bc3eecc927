"""§2.9: event-time tumbling windows + watermark into the exactly-once sink.

Uses a file-backed stream fed in two availableNow passes over one checkpoint:
pass 1 establishes the watermark; pass 2 delivers one late-but-in-bound event
(must merge into its window before finalization) and one too-late event
(must be dropped). Only watermark-finalized windows ever reach the table.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from batch_pipeline_via_lakehouse_spark.streaming.windows import stream_windowed_rollup
from batch_pipeline_via_lakehouse_spark.table import Table

IN_SCHEMA = StructType(
    [
        StructField("ts", TimestampType()),
        StructField("k", StringType()),
        StructField("v", IntegerType()),
    ]
)
OUT_SCHEMA = StructType(
    [
        StructField("window_start", TimestampType()),
        StructField("window_end", TimestampType()),
        StructField("k", StringType()),
        StructField("n", IntegerType()),
        StructField("sum_v", IntegerType()),
    ]
)


def _write(path, rows):
    with open(path, "w") as f:
        for ts, k, v in rows:
            f.write(json.dumps({"ts": ts, "k": k, "v": v}) + "\n")


def _run(spark, src, table, ckpt):
    stream = spark.readStream.schema(IN_SCHEMA).json(str(src))
    q = stream_windowed_rollup(
        stream, table, str(ckpt), ts_col="ts", window_seconds=60,
        lateness_seconds=30, key_cols=["k"],
        aggs=[F.count(F.lit(1)).cast("int").alias("n"),
              F.sum("v").cast("int").alias("sum_v")],
        trigger_seconds=None,  # availableNow
    )
    q.awaitTermination(120)


def test_windowed_rollup_watermark_and_late_data(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    t = Table.create(str(tmp_path / "t"), OUT_SCHEMA)
    ckpt = tmp_path / "ckpt"

    # pass 1: two events in window [10:00,10:01), one in [10:02,10:03);
    # max event time 10:02:10 -> watermark 10:01:40 -> first window finalizes
    _write(src / "a.json", [
        ("2026-01-01T10:00:05", "a", 1),
        ("2026-01-01T10:00:20", "a", 2),
        ("2026-01-01T10:02:10", "a", 10),
    ])
    _run(spark, src, t, ckpt)
    rows = {(str(r.window_start), r.k): (r.n, r.sum_v) for r in t.scan(spark).collect()}
    assert rows == {("2026-01-01 10:00:00", "a"): (2, 3)}  # only the closed window

    # pass 2: an in-bound event for the still-open [10:02,10:03) window, a
    # too-late event for the already-finalized [10:00,10:01) window (dropped),
    # and an advancing event that pushes the watermark past 10:03
    _write(src / "b.json", [
        ("2026-01-01T10:02:30", "a", 5),    # merges into the open window
        ("2026-01-01T10:00:59", "a", 100),  # beyond lateness bound: dropped
        ("2026-01-01T10:05:00", "b", 7),    # advances watermark to 10:04:30
    ])
    _run(spark, src, t, ckpt)
    rows = {(str(r.window_start), r.k): (r.n, r.sum_v) for r in t.scan(spark).collect()}
    assert rows[("2026-01-01 10:02:00", "a")] == (2, 15)  # late-in-bound merged
    assert rows[("2026-01-01 10:00:00", "a")] == (2, 3)  # unchanged: too-late dropped
    assert ("2026-01-01 10:05:00", "b") not in rows  # still open, not emitted
    assert len(rows) == 2
