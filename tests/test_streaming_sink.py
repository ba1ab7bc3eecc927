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
