"""Event-time windowed aggregation with watermark-bounded state (§2.9).

The standard Structured Streaming rollup the reference's dormant streaming
layer would need: group an event stream into tumbling event-time windows,
tolerate out-of-order arrivals up to a lateness bound, drop state for
windows the watermark has passed, and land FINAL per-window rows in an
engine table through the exactly-once sink.

Output mode is ``append``: a window's row is emitted exactly once, when the
watermark guarantees no further late events can join it — which is the only
mode that composes with an append-only table sink. State size is bounded by
(#keys x #open windows), independent of stream length — the property that
makes this runnable forever at 10^12-event scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..table.catalog import Table
from .sink import stream_append


def windowed_rollup(
    stream_df: DataFrame,
    ts_col: str,
    window_seconds: int,
    lateness_seconds: int,
    key_cols: list[str],
    aggs: list[Column],
) -> DataFrame:
    """Tumbling event-time window aggregation over a streaming DataFrame.

    Returns a streaming plan with columns
    ``window_start, window_end, *key_cols, <agg aliases>`` whose rows
    finalize when the watermark (max event time − ``lateness_seconds``)
    passes their window end. Events later than the bound are dropped by the
    engine — the documented, deterministic late-data policy."""
    w = F.window(F.col(ts_col), f"{window_seconds} seconds")
    out = (
        stream_df.withWatermark(ts_col, f"{lateness_seconds} seconds")
        .groupBy(w.alias("_w"), *key_cols)
        .agg(*aggs)
    )
    keep = [c for c in out.columns if c != "_w"]
    return out.select(
        F.col("_w.start").alias("window_start"),
        F.col("_w.end").alias("window_end"),
        *keep,
    )


def stream_windowed_rollup(
    stream_df: DataFrame,
    table: Table,
    checkpoint_dir: str,
    ts_col: str,
    window_seconds: int,
    lateness_seconds: int,
    key_cols: list[str],
    aggs: list[Column],
    query_name: str = "windowed-rollup",
    trigger_seconds: int | None = None,
) -> StreamingQuery:
    """Run ``windowed_rollup`` into ``table`` via the exactly-once batch-id
    sink (append mode — only watermark-finalized windows are written)."""
    rolled = windowed_rollup(
        stream_df, ts_col, window_seconds, lateness_seconds, key_cols, aggs
    )
    return stream_append(
        rolled, table, checkpoint_dir, query_name=query_name,
        trigger_seconds=trigger_seconds,
    )
