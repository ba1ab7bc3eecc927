"""K5/S5 parity: streaming append with exactly-once batch commits."""

import json
import time

from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from batch_pipeline_via_lakehouse_spark.streaming.sink import stream_append
from batch_pipeline_via_lakehouse_spark.table import Table

SCHEMA = StructType(
    [StructField("k", IntegerType()), StructField("v", StringType())]
)


def _write_json(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_file_stream_append_exactly_once(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    _write_json(src / "a.json", [{"k": i, "v": f"x{i}"} for i in range(10)])

    t = Table.create(str(tmp_path / "t"), SCHEMA)
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    q = stream_append(stream, t, str(tmp_path / "ckpt"), trigger_seconds=None)
    q.awaitTermination(120)
    assert t.scan(spark).count() == 10

    # second file, new availableNow run over the same checkpoint: only the
    # new data lands — the old batch id is not recommitted
    _write_json(src / "b.json", [{"k": i, "v": f"y{i}"} for i in range(5)])
    stream2 = spark.readStream.schema(SCHEMA).json(str(src))
    q2 = stream_append(stream2, t, str(tmp_path / "ckpt"), trigger_seconds=None)
    q2.awaitTermination(120)
    assert t.scan(spark).count() == 15
    # every streaming snapshot carries its batch id (idempotence key)
    ids = [s.summary.get("stream-batch-id") for s in t.snapshots()]
    assert len([i for i in ids if i is not None]) == len(set(i for i in ids if i is not None))


def test_batch_writer_replay_is_idempotent(spark, tmp_path):
    """Direct replay semantics (the at-least-once -> exactly-once upgrade):
    invoking the foreachBatch writer twice with one batch id — what a crashed
    driver does on restart — commits exactly one snapshot; a later batch id
    still commits."""
    from batch_pipeline_via_lakehouse_spark.streaming.sink import batch_writer

    t = Table.create(str(tmp_path / "t"), SCHEMA)
    w = batch_writer(t, "q-replay")
    df = spark.createDataFrame([(1, "a"), (2, "b")], SCHEMA)
    w(df, 0)
    n_snaps = len(t.snapshots())
    w(df, 0)  # replay of committed batch: no-op
    assert len(t.snapshots()) == n_snaps
    assert t.scan(spark).count() == 2
    w(spark.createDataFrame([(3, "c")], SCHEMA), 1)
    assert t.scan(spark).count() == 3
    # replay across CHECKPOINT LOSS: a fresh checkpoint replays old ids too
    w(df, 0)
    w(spark.createDataFrame([(3, "c")], SCHEMA), 1)
    assert t.scan(spark).count() == 3


def test_kafka_standin_source_end_to_end(spark, tmp_path):
    """S4 stand-in: Kafka-schema records from a file-backed 'broker log'
    through the exactly-once sink — including a crashed-and-restarted run
    (same log + fresh checkpoint) that must not duplicate rows."""
    from pyspark.sql import functions as F

    from batch_pipeline_via_lakehouse_spark.streaming.sink import (
        KAFKA_RECORD_DDL,
        read_kafka_standin,
        stream_append,
    )
    from pyspark.sql.types import _parse_datatype_string

    log = tmp_path / "broker"
    log.mkdir()
    recs = [
        {"key": f"k{i}", "value": json.dumps({"i": i}), "topic": "events",
         "partition": i % 2, "offset": i // 2, "timestamp": "2026-01-01T00:00:00"}
        for i in range(8)
    ]
    recs.append({"key": "x", "value": "{}", "topic": "other", "partition": 0,
                 "offset": 0, "timestamp": "2026-01-01T00:00:00"})
    _write_json(log / "seg0.json", recs)

    stream = read_kafka_standin(spark, str(log), "events")
    want = _parse_datatype_string(KAFKA_RECORD_DDL)
    assert [(f.name, f.dataType) for f in stream.schema.fields] == [
        (f.name, f.dataType) for f in want.fields
    ]

    # the reference's bronze parse runs unchanged on the stand-in schema:
    # CAST(value AS STRING) -> from_json (src/elt/bronze/_bronze_handler.py)
    parsed = stream.select(
        F.get_json_object(F.col("value").cast("string"), "$.i").cast("int").alias("k"),
        F.col("key").cast("string").alias("v"),
    )
    t = Table.create(str(tmp_path / "t"), SCHEMA)
    q = stream_append(parsed, t, str(tmp_path / "ckpt"), query_name="kq",
                      trigger_seconds=None)
    q.awaitTermination(120)
    assert t.scan(spark).count() == 8  # topic filter dropped the 9th record

    # crash simulation: fresh checkpoint replays the whole log; batch-id
    # dedup keeps the table exactly-once
    stream2 = read_kafka_standin(spark, str(log), "events")
    parsed2 = stream2.select(
        F.get_json_object(F.col("value").cast("string"), "$.i").cast("int").alias("k"),
        F.col("key").cast("string").alias("v"),
    )
    q2 = stream_append(parsed2, t, str(tmp_path / "ckpt2"), query_name="kq",
                       trigger_seconds=None)
    q2.awaitTermination(120)
    assert t.scan(spark).count() == 8
