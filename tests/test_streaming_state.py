"""§2.9: custom stateful operator — gap sessionization via
applyInPandasWithState, driven through a file stream over one checkpoint in
three availableNow passes (gap split, cross-batch state carry, event-time
timeout finalization)."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql.types import StringType, StructField, StructType, TimestampType

from batch_pipeline_via_lakehouse_spark.streaming.state import sessionize

IN_SCHEMA = StructType(
    [StructField("ts", TimestampType()), StructField("user", StringType())]
)


def _write(path, rows):
    with open(path, "w") as f:
        for ts, u in rows:
            f.write(json.dumps({"ts": ts, "user": u}) + "\n")


def _run(spark, src, out_dir, ckpt):
    stream = spark.readStream.schema(IN_SCHEMA).json(str(src))
    q = (
        sessionize(stream, key_col="user", ts_col="ts", gap_seconds=60,
                   lateness_seconds=0)
        .writeStream.format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    df = spark.read.schema(
        "k string, session_start timestamp, session_end timestamp, n_events long"
    ).parquet(str(out_dir))
    return {(r.k, str(r.session_start)): (str(r.session_end), r.n_events) for r in df.collect()}


def test_sessionize_gap_split_state_carry_and_timeout(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"

    # pass 1: two bursts for u1 separated by > gap — the first closes by gap
    # split as soon as the second arrives; the second stays open in state
    _write(src / "a.json", [
        ("2026-01-01T09:00:00", "u1"),
        ("2026-01-01T09:00:30", "u1"),
        ("2026-01-01T09:05:00", "u1"),
    ])
    got = _run(spark, src, out, ckpt)
    assert got == {("u1", "2026-01-01 09:00:00"): ("2026-01-01 09:00:30", 2)}

    # pass 2: an in-gap event extends the OPEN session carried in state
    # across the restart; nothing new closes (watermark still behind)
    _write(src / "b.json", [("2026-01-01T09:05:40", "u1")])
    got = _run(spark, src, out, ckpt)
    assert got == {("u1", "2026-01-01 09:00:00"): ("2026-01-01 09:00:30", 2)}

    # pass 3: an unrelated key far in the future advances the watermark past
    # the open session's timeout (09:06:40) — it finalizes via EventTimeTimeout
    _write(src / "c.json", [("2026-01-01T10:00:00", "u2")])
    got = _run(spark, src, out, ckpt)
    assert got[("u1", "2026-01-01 09:05:00")] == ("2026-01-01 09:05:40", 2)
    assert ("u2", "2026-01-01 10:00:00") not in got  # u2's session still open
    assert len(got) == 2
