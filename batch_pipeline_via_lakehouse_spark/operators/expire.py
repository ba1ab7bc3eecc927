"""Snapshot expiry + reachability-based orphan-file GC.

The reference accumulates snapshots forever (no expire_snapshots /
orphan-GC call anywhere — SURVEY.md §4.1 last row); at 10^12-sequence scale
that is unbounded metadata and storage growth, so the engine implements both:

- *expire*: drop snapshot records outside the retention policy (keep the
  current one, the last ``retain_last``, and anything newer than
  ``older_than_ms``). Readers pinned to retained snapshots are unaffected.
- *GC*: a data/manifest file is live iff reachable from a retained snapshot
  (set-union over their manifests). Everything else under the table dir is
  deleted — including leftovers of crashed writes that never committed —
  guarded by a modification-time grace window so in-flight commits survive.

Reachability is computed on manifest metadata only; no data is read.
"""

from __future__ import annotations

import glob
import os

from ..table.catalog import Table
from ..table.format import now_ms


def expire_snapshots(
    table: Table,
    retain_last: int = 1,
    older_than_ms: int | None = None,
    gc: bool = True,
    gc_grace_ms: int = 24 * 3600 * 1000,
    spark=None,
) -> dict:
    """Expire snapshots outside the retention policy; optionally GC files that
    only they referenced. Returns a report of what was removed.

    ``gc_grace_ms`` defaults to the same 24h window as ``gc_orphans`` so a
    concurrent in-flight writer's uncommitted files survive; pass 0 only when
    no writer is running. Stream batch ids recorded in expired snapshot
    summaries are folded into the persistent stream-state watermark first, so
    the streaming sink's exactly-once dedup survives expiry."""
    snaps = table.snapshots()
    current = table.current_snapshot_id()
    if not snaps:
        return {"expired": [], "deleted_files": 0, "deleted_manifests": 0, "swept_staging": 0}

    by_recency = sorted(snaps, key=lambda s: s.snapshot_id, reverse=True)
    keep = {s.snapshot_id for s in by_recency[: max(1, retain_last)]}
    keep.add(current)
    if older_than_ms is not None:
        keep |= {s.snapshot_id for s in snaps if s.timestamp_ms >= older_than_ms}

    expired = [s for s in snaps if s.snapshot_id not in keep]

    # preserve exactly-once stream dedup across expiry: fold each expired
    # snapshot's stream batch id into the persistent per-query max watermark
    from ..streaming.sink import load_stream_state, save_stream_state

    state = load_stream_state(table)
    dirty = False
    for s in expired:
        q = s.summary.get("stream-query")
        if q is not None and "stream-batch-id" in s.summary:
            bid = int(s.summary["stream-batch-id"])
            if bid > state.get(q, -1):
                state[q] = bid
                dirty = True
    if dirty:
        save_stream_state(table, state)

    for s in expired:
        os.remove(os.path.join(table.metadata_dir, f"snap-{s.snapshot_id}.json"))

    report = {
        "expired": [s.snapshot_id for s in expired],
        "deleted_files": 0,
        "deleted_manifests": 0,
        "swept_staging": 0,
    }
    if gc:
        g = gc_orphans(table, grace_ms=gc_grace_ms, spark=spark)
        report.update(
            deleted_files=g["deleted_files"],
            deleted_manifests=g["deleted_manifests"],
            swept_staging=g["swept_staging"],
        )
    return report


def gc_orphans(
    table: Table,
    grace_ms: int = 24 * 3600 * 1000,
    spark=None,
    distributed: bool | None = None,
) -> dict:
    """Delete data files and manifests unreachable from any retained snapshot.

    ``grace_ms`` protects recently-written files (in-flight commits that have
    not yet flipped VERSION). Set 0 only when no writer is running.

    ``distributed=None`` auto-selects: with a session and more than
    DISTRIBUTED_PLAN_THRESHOLD live files, both the reachability set and the
    storage listing/delete run as Spark jobs (one task per commit dir) —
    identical deletions to the driver fold, pytest-asserted. Below it the
    driver fold wins (no job-launch latency)."""
    if distributed is None:
        from ..sources.scan import DISTRIBUTED_PLAN_THRESHOLD, snapshot_file_count

        distributed = (
            spark is not None
            and snapshot_file_count(table) > DISTRIBUTED_PLAN_THRESHOLD
        )
    cutoff = now_ms() - grace_ms
    touched_dirs: set[str] = set()
    if distributed:
        if spark is None:
            raise ValueError("distributed GC requires a SparkSession")
        deleted_files, touched_dirs = _gc_data_distributed(spark, table, cutoff)
        live_manifests = {m for s in table.snapshots() for m in s.manifests}
    else:
        live_data: set[str] = set()
        live_manifests = set()
        for s in table.snapshots():
            live_manifests.update(s.manifests)
            for f in table.live_files(s.snapshot_id):
                live_data.add(f.path)

        deleted_files = 0
        # os.walk, not glob: glob skips dotfiles, which would leave orphaned
        # Hadoop .crc sidecars behind forever. A sidecar lives iff its data
        # file lives (_gc_guard_path), so live files keep their checksums.
        for sub, _, names in os.walk(table.data_dir):
            for n in names:
                p = os.path.join(sub, n)
                rel = os.path.relpath(p, table.root)
                if _gc_guard_path(rel) in live_data:
                    continue
                if os.path.getmtime(p) * 1000 > cutoff:
                    continue
                os.remove(p)
                touched_dirs.add(sub)
                deleted_files += 1

    deleted_manifests = 0
    for p in glob.glob(os.path.join(table.metadata_dir, "manifest-*.parquet")):
        if os.path.basename(p) in live_manifests:
            continue
        if os.path.getmtime(p) * 1000 > cutoff:
            continue
        os.remove(p)
        deleted_manifests += 1

    # sweep commit dirs emptied by THIS GC's deletions only: bottom-up from
    # each dir a delete touched, then its ancestors up to data_dir. Scoped
    # to touched dirs so the sweep never lists the untouched bulk of the
    # table (the former recursive full-tree glob was the last O(#files)
    # driver listing on the distributed path).
    for d in sorted(touched_dirs, key=len, reverse=True):
        p = os.path.normpath(d)
        data_root = os.path.normpath(table.data_dir)
        while p.startswith(data_root) and p != data_root:
            try:
                if os.path.isdir(p) and not os.listdir(p):
                    os.rmdir(p)
                else:
                    break
            except OSError:
                break  # concurrent writer re-populated it — leave it
            p = os.path.dirname(p)

    # stale clustering staging runs (crashed jobs clean up on resume/success;
    # this catches jobs that never came back) — same grace window. Staleness
    # is judged by the NEWEST mtime anywhere under the job dir: the top-level
    # dir's mtime is set at job start and never refreshed by nested run
    # writes, so using it alone would sweep a long-running job's live staging
    # mid-run (feeding a silent-data-loss path in the native cluster commit).
    import shutil

    swept_staging = 0
    for d in glob.glob(os.path.join(table.root, "_staging", "*")):
        if not os.path.isdir(d):
            continue
        newest = os.path.getmtime(d)
        for sub, dirs, names in os.walk(d):
            for n in [*dirs, *names]:
                try:
                    newest = max(newest, os.path.getmtime(os.path.join(sub, n)))
                except OSError:
                    continue  # a racing writer moved it; treat as active
        if newest * 1000 <= cutoff:
            shutil.rmtree(d, ignore_errors=True)
            swept_staging += 1

    table._manifest_cache.clear()
    return {
        "deleted_files": deleted_files,
        "deleted_manifests": deleted_manifests,
        "swept_staging": swept_staging,
    }


def _gc_guard_path(rel: str) -> str:
    """Liveness key for a storage path: a Hadoop checksum sidecar
    (``.<name>.crc``) lives exactly as long as its data file does."""
    d, name = os.path.split(rel)
    if name.startswith(".") and name.endswith(".crc"):
        return os.path.join(d, name[1:-4])
    return rel


def _gc_data_distributed(spark, table: Table, cutoff_ms: int) -> tuple[int, set[str]]:
    """Spark-job orphan deletion: union-of-snapshots reachability as a
    DataFrame (manifests are plain Parquet), a listing task per commit dir
    (`data/<uuid>` — the natural storage-prefix shards), a left-anti join to
    find orphans, and executor-side mtime-guarded deletes. The driver never
    materializes the file list; it gets back only (count, dirs-touched) —
    bounded by deleted-dir count, for the scoped empty-dir sweep.

    Storage requirement: executor tasks address the table through plain
    filesystem paths (os.walk/os.remove), so the table root must be a
    SHARED filesystem visible to every executor — local mode, NFS, or a
    FUSE-mounted object store. On a multi-host cluster without a shared
    mount, swap these task bodies for the object store's list/delete API
    (the sharding and join shape are storage-agnostic)."""
    import pandas as pd

    from ..sources.scan import manifest_df

    live = None
    for s in table.snapshots():
        mdf = manifest_df(spark, table, s.snapshot_id).select("path")
        live = mdf if live is None else live.union(mdf)
    if live is None:
        live = spark.createDataFrame([], "path string")
    live = live.distinct()

    root, data_dir = table.root, table.data_dir
    # shards: one per commit dir, plus "" for files sitting directly in
    # data_dir (a crashed writer can leave those too — the driver fold walks
    # them, so the distributed path must as well)
    commit_dirs = sorted(
        d for d in os.listdir(data_dir) if os.path.isdir(os.path.join(data_dir, d))
    ) + [""]

    def list_task(pdfs):
        for pdf in pdfs:
            rows, guards = [], []
            for d in pdf["dir"]:
                if d == "":
                    top = [e.name for e in os.scandir(data_dir) if e.is_file()]
                    walk = [(data_dir, [], top)]
                else:
                    walk = os.walk(os.path.join(data_dir, d))
                for sub, _, names in walk:
                    for n in names:
                        rel = os.path.relpath(os.path.join(sub, n), root)
                        rows.append(rel)
                        guards.append(_gc_guard_path(rel))
            yield pd.DataFrame({"path": rows, "guard": guards})

    n_tasks = min(len(commit_dirs), max(1, spark.sparkContext.defaultParallelism * 2))
    found = (
        spark.createDataFrame([(d,) for d in commit_dirs], "dir string")
        .repartition(n_tasks)
        .mapInPandas(list_task, "path string, guard string")
    )
    orphans = found.join(
        live.withColumnRenamed("path", "guard"), "guard", "left_anti"
    ).select("path")

    def delete_task(pdfs):
        from collections import Counter

        cnt: Counter = Counter()
        for pdf in pdfs:
            for rel in pdf["path"]:
                p = os.path.join(root, rel)
                try:
                    if os.path.getmtime(p) * 1000 <= cutoff_ms:
                        os.remove(p)
                        cnt[os.path.dirname(p)] += 1
                except OSError:
                    continue  # already gone (concurrent GC) — not an error
        yield pd.DataFrame({"dir": list(cnt.keys()), "n": list(cnt.values())})

    rows = orphans.mapInPandas(delete_task, "dir string, n long").collect()
    return int(sum(r.n for r in rows)), {r.dir for r in rows}
