"""Custom stateful streaming operator: gap-based sessionization (§2.9).

The one streaming shape windows can't express: per-key sessions that close
after ``gap_seconds`` of event-time silence. Implemented with
``applyInPandasWithState`` — Arrow-batched per-key state, event-time timeout
tied to the watermark, append-mode emission of CLOSED sessions only (the
same finalize-once discipline as streaming/windows.py, so the output
composes with the exactly-once table sink).

State per key is the set of OPEN session fragments — disjoint
(start, last, n) runs separated by more than the gap — kept until the
watermark passes ``last + gap``. Buffering fragments (not just one open
session) makes the operator correct for cross-batch out-of-order arrivals
anywhere inside the lateness bound: an in-bound event earlier than the
current session's start extends that session backwards, forms its own
earlier session, or bridges two fragments into one — whichever event-time
order dictates — because a fragment is only finalized once NO in-bound
event could still touch it (watermark > last + gap). Late events beyond the
watermark are dropped by the engine before they reach the operator.

Fragment count is bounded by (observed event-time span) / gap per key —
out-of-order data can hold a few fragments open; totally ordered data holds
exactly one.

State-schema note: this is state format v2 (three parallel long arrays). v1
checkpoints (one ``start_ms/last_ms/n`` triple) cannot be decoded under the
v2 ``stateStructType``; ``drain_checkpoint_sessions`` ships the migration:
it reads a stopped v1 checkpoint's state store offline (Spark's state data
source) and emits every open session as final, after which the v2 query
starts on a fresh checkpoint.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_DDL = (
    "k string, session_start timestamp, session_end timestamp, n_events long"
)
_STATE_DDL = "starts array<long>, lasts array<long>, ns array<long>"


def _ms(ts) -> int:
    return int(ts.value // 1_000_000)  # pandas Timestamp ns -> ms


def _fold(frags: list[list[int]], ts_ms: list[int], gap_ms: int) -> list[list[int]]:
    """Fold a batch of event times into the fragment set in ONE sort + merge
    pass (arrival order is irrelevant — only event-time distance matters):
    each event starts a new fragment, extends one, or bridges neighbors.
    Keeps the invariant: sorted by start, consecutive fragments separated by
    MORE than the gap. O((F+E) log(F+E)) per batch, not per event."""
    frags = frags + [[t, t, 1] for t in ts_ms]
    if not frags:
        return frags
    frags.sort(key=lambda f: f[0])
    out = [frags[0]]
    for f in frags[1:]:
        cur = out[-1]
        if f[0] - cur[1] <= gap_ms:  # within gap -> same session
            cur[1] = max(cur[1], f[1])
            cur[2] += f[2]
        else:
            out.append(f)
    return out


def make_sessionizer(gap_seconds: int):
    """Build the applyInPandasWithState function for a given gap."""
    gap_ms = gap_seconds * 1000

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        frags: list[list[int]] = []
        if state.exists:
            starts, lasts, ns = state.get
            frags = [list(f) for f in zip(starts, lasts, ns)]

        if not state.hasTimedOut:
            frags = _fold(
                frags, [_ms(t) for p in pdfs for t in p["ts"]], gap_ms
            )

        # a fragment is FINAL iff no admissible event (ts >= watermark) can
        # still fold into or bridge onto it: watermark > last + gap
        wm = state.getCurrentWatermarkMs()
        closed = [f for f in frags if f[1] + gap_ms < wm]
        kept = [f for f in frags if f[1] + gap_ms >= wm]

        if kept:
            state.update(
                ([f[0] for f in kept], [f[1] for f in kept], [f[2] for f in kept])
            )
            # earliest fragment to become final fires the next timeout; never
            # earlier than the current watermark (engine requirement)
            state.setTimeoutTimestamp(max(min(f[1] for f in kept) + gap_ms, wm))
        elif state.exists:
            state.remove()

        if closed:
            yield pd.DataFrame(
                {
                    "k": [key[0]] * len(closed),
                    "session_start": [pd.Timestamp(f[0], unit="ms") for f in closed],
                    "session_end": [pd.Timestamp(f[1], unit="ms") for f in closed],
                    "n_events": [f[2] for f in closed],
                }
            )

    return fn


def drain_checkpoint_sessions(spark, checkpoint_dir: str) -> DataFrame:
    """Offline drain of a sessionizer checkpoint — the shipped v1 -> v2
    state-migration path (v1 single-triple state cannot be decoded under the
    v2 fragment-set ``stateStructType``): stop the old query, read its
    checkpoint's state store with Spark's state data source (public API
    since Spark 4.0), emit every OPEN fragment as a final session row, union
    that into the session table, then start the new query on a FRESH
    checkpoint. Works for both v1 state (one ``start_ms/last_ms/n`` triple
    per key) and v2 state (parallel fragment arrays), so it also serves as a
    generic end-of-life drain when decommissioning a stream.

    Emitting open fragments as final is exactly what letting the v1 query
    time everything out would produce (the drain replaces the "stop input
    and wait for watermark" dance), provided the v1 input is stopped first —
    events arriving after the drain start new sessions under v2."""
    from pyspark.sql import functions as F

    st = spark.read.format("statestore").load(checkpoint_dir)
    vtype = st.schema["value"].dataType
    # apply(In)PandasWithState wraps the user state struct in `groupState`
    # beside the engine's `timeoutTimestamp`; flatMapGroupsWithState-style
    # sources expose the user struct directly
    if "groupState" in vtype.fieldNames():
        state = "value.groupState"
        vtype = vtype["groupState"].dataType
    else:
        state = "value"
    vfields = set(vtype.fieldNames())
    if {"starts", "lasts", "ns"} <= vfields:  # v2 fragment-set state
        frag = F.explode(
            F.arrays_zip(
                F.col(f"{state}.starts").alias("s"),
                F.col(f"{state}.lasts").alias("l"),
                F.col(f"{state}.ns").alias("n"),
            )
        ).alias("f")
        return (
            st.filter(F.col(f"{state}.starts").isNotNull())
            .select(F.col("key.k").alias("k"), frag)
            .select(
                "k",
                F.timestamp_millis(F.col("f.s")).alias("session_start"),
                F.timestamp_millis(F.col("f.l")).alias("session_end"),
                F.col("f.n").alias("n_events"),
            )
        )
    return st.filter(F.col(f"{state}.start_ms").isNotNull()).select(
        # v1 single-open-session state
        F.col("key.k").alias("k"),
        F.timestamp_millis(F.col(f"{state}.start_ms")).alias("session_start"),
        F.timestamp_millis(F.col(f"{state}.last_ms")).alias("session_end"),
        F.col(f"{state}.n").alias("n_events"),
    )


def sessionize(
    stream_df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int,
    lateness_seconds: int,
) -> DataFrame:
    """Streaming plan emitting closed sessions
    ``(k, session_start, session_end, n_events)`` for ``stream_df``."""
    from pyspark.sql import functions as F

    events = stream_df.select(
        F.col(key_col).cast("string").alias("k"), F.col(ts_col).alias("ts")
    ).withWatermark("ts", f"{lateness_seconds} seconds")
    return events.groupBy("k").applyInPandasWithState(
        make_sessionizer(gap_seconds),
        outputStructType=_OUT_DDL,
        stateStructType=_STATE_DDL,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
