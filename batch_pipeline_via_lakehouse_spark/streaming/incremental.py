"""Incremental (snapshot-delta) reads — the engine's 'streaming' mode.

The reference's streaming surface is dormant (SURVEY.md §2.9): its actual
incremental pattern is "rows newer than MAX(cursor)" SQL
(`src/elt/silver/_silver_handler.py:31-41`). Iceberg's streaming read
(`_silver_handler.py:233-235`) is snapshot tailing — which is exactly what
the engine's snapshot log supports natively: the rows added between two
snapshots are the rows of files present in B but not reachable at A.

Note this is append-delta semantics: files *rewritten* by maintenance
(compact/cluster) carry no new rows, so deltas are computed over
non-maintenance snapshots' added files, matching Iceberg's
'read appends only' streaming semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..table.catalog import Table
from ..table.format import DataFile

# Only pure appends yield an unambiguous row-delta. Maintenance rewrites
# (compact/cluster/rewrite-manifests) add no rows; merge/overwrite rewrite
# carried rows too, so treating their files as deltas would double-count —
# same stance as Iceberg's append-only streaming read.
_APPEND_OPS = {"append"}


def files_added_between(table: Table, from_snapshot: int | None, to_snapshot: int | None) -> list[DataFile]:
    """Data files introduced by row-adding commits in (from, to]."""
    to_snapshot = to_snapshot if to_snapshot is not None else table.current_snapshot_id()
    if to_snapshot is None:
        return []
    before = {f.path for f in table.live_files(from_snapshot)} if from_snapshot else set()

    # walk the snapshot chain (from, to] newest-first, collecting files that
    # appear in a row-adding snapshot and weren't live at `from`.
    added: dict[str, DataFile] = {}
    sid = to_snapshot
    chain: list[int] = []
    while sid is not None and (from_snapshot is None or sid > from_snapshot):
        chain.append(sid)
        sid = table.snapshot(sid).parent_id
    seen_live = {f.path: f for f in table.live_files(to_snapshot)}
    for s in chain:
        snap = table.snapshot(s)
        if snap.operation not in _APPEND_OPS:
            continue
        parent_live = {f.path for f in table.live_files(snap.parent_id)} if snap.parent_id else set()
        for f in table.live_files(s):
            if f.path not in parent_live and f.path not in before:
                added[f.path] = seen_live.get(f.path, f)
    return list(added.values())


def read_incremental(
    spark: SparkSession, table: Table, since_snapshot: int | None, to_snapshot: int | None = None
) -> DataFrame:
    """DataFrame of rows appended after ``since_snapshot`` (exclusive)."""
    return table.read_files(spark, files_added_between(table, since_snapshot, to_snapshot))
