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


def test_sessionize_out_of_order_within_watermark(spark, tmp_path):
    """Cross-batch out-of-order arrivals inside the lateness bound must be
    folded in EVENT-time order: an in-bound event earlier than the open
    session's start extends it backwards, a much-earlier one forms its own
    separate session, and a mid-gap one bridges two open fragments into one.
    (The single-open-session fold got all three wrong: start never moved
    earlier and separate/bridged sessions could not form.)"""

    def run(src):
        return _run_lat(spark, src, tmp_path / "out2", tmp_path / "ckpt2")

    def _run_lat(spark, src, out_dir, ckpt):
        stream = spark.readStream.schema(IN_SCHEMA).json(str(src))
        q = (
            sessionize(stream, key_col="user", ts_col="ts", gap_seconds=60,
                       lateness_seconds=3600)
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
        return {
            (r.k, str(r.session_start)): (str(r.session_end), r.n_events)
            for r in df.collect()
        }

    src = tmp_path / "in2"
    src.mkdir()
    # batch 1: u1 one burst; u3 two fragments 120s apart (> gap)
    _write(src / "a.json", [
        ("2026-01-01T10:00:00", "u1"),
        ("2026-01-01T10:00:30", "u1"),
        ("2026-01-01T10:00:00", "u3"),
        ("2026-01-01T10:02:00", "u3"),
    ])
    assert run(src) == {}  # watermark (max - 1h) far behind; nothing final

    # batch 2, all in-bound but EARLIER than the open sessions:
    #  u1 09:59:30 -> within gap of 10:00:00: extends the session backwards
    #  u1 09:30:00 -> > gap earlier: its own separate session
    #  u3 10:01:00 -> bridges the two fragments into one session
    _write(src / "b.json", [
        ("2026-01-01T09:59:30", "u1"),
        ("2026-01-01T09:30:00", "u1"),
        ("2026-01-01T10:01:00", "u3"),
    ])
    assert run(src) == {}

    # batch 3: u2 far ahead pushes the watermark past everything open
    _write(src / "c.json", [("2026-01-01T11:30:00", "u2")])
    got = run(src)
    assert got == {
        ("u1", "2026-01-01 09:30:00"): ("2026-01-01 09:30:00", 1),
        ("u1", "2026-01-01 09:59:30"): ("2026-01-01 10:00:30", 3),
        ("u3", "2026-01-01 10:00:00"): ("2026-01-01 10:02:00", 3),
    }
