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


def test_drain_checkpoint_sessions_v1_to_v2(spark, tmp_path):
    """The shipped v1 -> v2 migration: run a v1-format sessionizer (single
    start_ms/last_ms/n triple state) that leaves sessions OPEN in its
    checkpoint, drain that checkpoint offline with the state data source,
    then continue under the v2 operator on a fresh checkpoint — the union
    must equal all sessions."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from batch_pipeline_via_lakehouse_spark.streaming.state import (
        drain_checkpoint_sessions,
        sessionize,
    )

    # --- minimal v1 operator: one open (start, last, n) triple, no emission
    # until timeout (its open state is what the drain must recover) ---------
    def v1_fn(key, pdfs, state: GroupState):
        start = last = None
        n = 0
        if state.exists:
            start, last, n = state.get
        for p in pdfs:
            for t in p["ts"]:
                ms = int(t.value // 1_000_000)
                start = ms if start is None else min(start, ms)
                last = ms if last is None else max(last, ms)
                n += 1
        state.update((start, last, n))
        return
        yield  # pragma: no cover — generator with no emission

    src1 = tmp_path / "in_v1"
    src1.mkdir()
    _write(src1 / "a.json", [
        ("2026-01-01T09:00:00", "u1"),
        ("2026-01-01T09:00:30", "u1"),
        ("2026-01-01T09:10:00", "u2"),
    ])
    ckpt1 = tmp_path / "ckpt_v1"
    stream = spark.readStream.schema(IN_SCHEMA).json(str(src1))
    events = stream.selectExpr("cast(user as string) as k", "ts").withWatermark(
        "ts", "0 seconds"
    )
    q = (
        events.groupBy("k")
        .applyInPandasWithState(
            v1_fn,
            outputStructType="k string, session_start timestamp, "
            "session_end timestamp, n_events long",
            stateStructType="start_ms long, last_ms long, n long",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out_v1"))
        .option("checkpointLocation", str(ckpt1))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    drained = {
        (r.k, str(r.session_start)): (str(r.session_end), r.n_events)
        for r in drain_checkpoint_sessions(spark, str(ckpt1)).collect()
    }
    assert drained == {
        ("u1", "2026-01-01 09:00:00"): ("2026-01-01 09:00:30", 2),
        ("u2", "2026-01-01 09:10:00"): ("2026-01-01 09:10:00", 1),
    }

    # --- v2 continues on a FRESH checkpoint; post-migration events form new
    # sessions under the fragment-set operator ------------------------------
    src2 = tmp_path / "in_v2"
    src2.mkdir()
    _write(src2 / "b.json", [
        ("2026-01-01T09:20:00", "u1"),
        ("2026-01-01T09:20:20", "u1"),
        ("2026-01-01T11:00:00", "u9"),  # watermark pusher: closes u1's session
    ])
    got = _run(spark, src2, tmp_path / "out_v2", tmp_path / "ckpt_v2")
    assert got[("u1", "2026-01-01 09:20:00")] == ("2026-01-01 09:20:20", 2)

    # union = complete session history across the migration
    assert set(drained) | set(got) >= {
        ("u1", "2026-01-01 09:00:00"),
        ("u2", "2026-01-01 09:10:00"),
        ("u1", "2026-01-01 09:20:00"),
    }


def test_drain_checkpoint_sessions_v2_state(spark, tmp_path):
    """The same drain utility decodes v2 fragment-set state — the generic
    end-of-life drain: every open fragment comes out as a final session."""
    from batch_pipeline_via_lakehouse_spark.streaming.state import (
        drain_checkpoint_sessions,
    )

    src = tmp_path / "in_d2"
    src.mkdir()
    # u3 holds TWO open fragments (120s apart > 60s gap); nothing closes
    # (watermark stays behind with lateness far ahead of event span)
    _write(src / "a.json", [
        ("2026-01-01T10:00:00", "u3"),
        ("2026-01-01T10:02:00", "u3"),
    ])
    out, ckpt = tmp_path / "out_d2", tmp_path / "ckpt_d2"
    stream = spark.readStream.schema(IN_SCHEMA).json(str(src))
    q = (
        sessionize_lat(stream)
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    drained = {
        (r.k, str(r.session_start)): (str(r.session_end), r.n_events)
        for r in drain_checkpoint_sessions(spark, str(ckpt)).collect()
    }
    assert drained == {
        ("u3", "2026-01-01 10:00:00"): ("2026-01-01 10:00:00", 1),
        ("u3", "2026-01-01 10:02:00"): ("2026-01-01 10:02:00", 1),
    }


def sessionize_lat(stream):
    from batch_pipeline_via_lakehouse_spark.streaming.state import sessionize

    return sessionize(
        stream, key_col="user", ts_col="ts", gap_seconds=60, lateness_seconds=3600
    )
