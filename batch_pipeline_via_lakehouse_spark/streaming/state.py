"""Custom stateful streaming operator: gap-based sessionization (§2.9).

The one streaming shape windows can't express: per-key sessions that close
after ``gap_seconds`` of event-time silence. Implemented with
``applyInPandasWithState`` — Arrow-batched per-key state, event-time timeout
tied to the watermark, append-mode emission of CLOSED sessions only (the
same finalize-once discipline as streaming/windows.py, so the output
composes with the exactly-once table sink).

State per key is one open session (3 longs) — bounded by key cardinality,
independent of stream length. Late events beyond the watermark are dropped
by the engine before they reach the operator; in-bound out-of-order events
within a batch are sorted before folding.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_DDL = (
    "k string, session_start timestamp, session_end timestamp, n_events long"
)
_STATE_DDL = "start_ms long, last_ms long, n long"


def _ms(ts) -> int:
    return int(ts.value // 1_000_000)  # pandas Timestamp ns -> ms


def make_sessionizer(gap_seconds: int):
    """Build the applyInPandasWithState function for a given gap."""
    gap_ms = gap_seconds * 1000

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        def closed(start_ms: int, last_ms: int, n: int) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "k": [key[0]],
                    "session_start": [pd.Timestamp(start_ms, unit="ms")],
                    "session_end": [pd.Timestamp(last_ms, unit="ms")],
                    "n_events": [n],
                }
            )

        if state.hasTimedOut:
            # watermark passed last_event + gap: the open session is final
            start_ms, last_ms, n = state.get
            state.remove()
            yield closed(start_ms, last_ms, n)
            return

        ts = pd.concat([p["ts"] for p in pdfs]).sort_values()
        cur = list(state.get) if state.exists else None
        for t in ts:
            t_ms = _ms(t)
            if cur is None:
                cur = [t_ms, t_ms, 0]
            elif t_ms - cur[1] > gap_ms:
                yield closed(*cur)
                cur = [t_ms, t_ms, 0]
            cur[1] = max(cur[1], t_ms)
            cur[2] += 1
        if cur is not None:
            state.update(tuple(cur))
            state.setTimeoutTimestamp(cur[1] + gap_ms)

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
