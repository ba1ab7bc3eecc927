"""Streaming append sink into an engine table — exactly-once via batch-id
dedup.

The reference ships (dormant) streaming append sinks with processingTime
triggers and checkpoints (`src/elt/bronze/_bronze_handler.py:76-96`,
`src/elt/silver/_silver_handler.py:238-255`; K5). The engine equivalent uses
``foreachBatch``: Structured Streaming's checkpoint guarantees each micro-
batch id is replayed at-least-once after a crash; the sink records the batch
id in the snapshot summary and skips ids it has already committed, upgrading
to exactly-once (the standard idempotent-foreachBatch pattern).

Kafka source parity (S4): ``read_kafka`` builds the standard subscribe-from-
earliest reader (`_bronze_handler.py:66-73`); untestable in this sandbox (no
broker), so it is a thin, documented builder only.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..table.catalog import Table
from ..table.format import atomic_write


def committed_batch_ids(table: Table, query_name: str) -> set[int]:
    return {
        s.summary["stream-batch-id"]
        for s in table.snapshots()
        if s.summary.get("stream-query") == query_name and "stream-batch-id" in s.summary
    }


def _stream_state_path(table: Table) -> str:
    return os.path.join(table.metadata_dir, "stream-state.json")


def load_stream_state(table: Table) -> dict[str, int]:
    """query_name -> highest batch id whose snapshot record has been expired.
    Snapshot expiry folds batch ids here so the exactly-once dedup survives
    metadata retention (batch ids are monotonic, so a max watermark is a
    complete record of what expired)."""
    p = _stream_state_path(table)
    if not os.path.exists(p):
        return {}
    with open(p) as f:
        return {k: int(v) for k, v in json.load(f).items()}


def save_stream_state(table: Table, state: dict[str, int]) -> None:
    atomic_write(_stream_state_path(table), json.dumps(state, indent=2, sort_keys=True))


def is_batch_committed(table: Table, query_name: str, batch_id: int) -> bool:
    if batch_id <= load_stream_state(table).get(query_name, -1):
        return True
    return batch_id in committed_batch_ids(table, query_name)


def batch_writer(table: Table, query_name: str, num_files: int | None = None):
    """The exactly-once foreachBatch sink: skip batch ids already committed
    under ``query_name``, else write + commit with the id recorded in the
    snapshot summary. Exposed so replay semantics are directly unit-testable
    (calling the writer twice with one batch id must commit once)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if is_batch_committed(table, query_name, batch_id):
            return  # replayed micro-batch after restart — already committed
        files = table.write_datafiles(batch_df, num_files=num_files)
        if files:
            table.commit(
                files,
                set(),
                "append",
                {"stream-query": query_name, "stream-batch-id": batch_id},
            )

    return write_batch


def stream_append(
    stream_df: DataFrame,
    table: Table,
    checkpoint_dir: str,
    query_name: str = "stream-append",
    trigger_seconds: int | None = 5,
    num_files: int | None = None,
) -> StreamingQuery:
    """Start a streaming append into ``table``; returns the StreamingQuery.

    ``query_name`` is the idempotence key: batch ids already committed under
    it are skipped on replay. It must therefore be UNIQUE per logical stream —
    reusing a name for a brand-new stream (fresh checkpoint) would silently
    drop its early batches as 'already committed'."""
    writer = (
        stream_df.writeStream.queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(batch_writer(table, query_name, num_files))
    )
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_kafka(spark: SparkSession, servers: str, topic: str) -> DataFrame:
    """Kafka source builder (S4; `_bronze_handler.py:66-73`). Requires the
    spark-sql-kafka package on the cluster; no broker in this sandbox — use
    ``read_kafka_standin`` for broker-less end-to-end tests of the same
    downstream pipeline."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", servers)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .load()
    )


# Kafka record shape as Spark's kafka source presents it — the stand-in
# produces the identical schema so every transformation written against
# read_kafka() (e.g. the reference's CAST(value AS STRING) + from_json parse)
# runs unchanged against it.
KAFKA_RECORD_DDL = (
    "key binary, value binary, topic string, partition int, offset long, "
    "timestamp timestamp, timestampType int"
)

_STANDIN_FILE_DDL = (
    "key string, value string, topic string, partition int, offset long, "
    "timestamp timestamp"
)


def read_kafka_standin(spark: SparkSession, log_dir: str, topic: str) -> DataFrame:
    """In-process Kafka stand-in (S4 test double): a file-backed stream over
    JSONL 'broker log' files with the exact column set and types of Spark's
    kafka source (key/value as binary, topic/partition/offset/timestamp/
    timestampType). Producers append files to ``log_dir``; Structured
    Streaming's file tracking plays the micro-batch role of consumer offsets,
    and the engine sink's batch-id dedup provides the same exactly-once
    guarantee the Kafka path gets. No broker required."""
    from pyspark.sql import functions as F

    raw = spark.readStream.schema(_STANDIN_FILE_DDL).json(log_dir)
    return (
        raw.filter(F.col("topic") == topic)
        .select(
            F.col("key").cast("binary").alias("key"),
            F.col("value").cast("binary").alias("value"),
            "topic",
            "partition",
            "offset",
            "timestamp",
            F.lit(0).alias("timestampType"),  # CreateTime, like the broker default
        )
    )
