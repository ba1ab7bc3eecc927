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
v2 ``stateStructType``; restarting a v1 query against a retained checkpoint
requires draining it first (stop input, let all sessions time out and emit)
or discarding the checkpoint.
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
