"""Bin-packing small-file compaction (the engine's flagship maintenance pass).

The reference never compacts — its Iceberg tables accumulate one fileset per
append (`src/elt/bronze/_bronze_handler.py:50-57`) and nothing ever rewrites
them; this operator fills that gap (SURVEY.md §4.1 last row).

Plan: per identity-partition, take live files smaller than
``small_threshold`` (default 3/4 of target) and first-fit-decreasing them
into bins of ~``target_bytes``. Execute: per partition, read the binned
files, ``coalesce`` to the planned output count (narrow — compaction never
needs a shuffle), rewrite, and commit a replace-snapshot. Scan output is
byte-identical to pre-compaction (token-array equality invariant); readers
pinned to older snapshots keep seeing the old files until expiry GC.

Scale notes:
- partition-level parallelism via a thread pool of concurrent Spark jobs
  (the scheduler interleaves their tasks across executors);
- per-partition commit log -> kill/resume without duplicate work;
- planning is metadata-only (manifest stats), never a data scan.
"""

from __future__ import annotations

import threading
import time
import uuid
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..sources.scan import partition_key
from ..table.catalog import Table
from ..table.format import DataFile
from .commitlog import CommitLog

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


@dataclass
class CompactionPlan:
    # partition-key (sorted JSON) -> list of bins; each bin is files to merge
    bins: dict[str, list[list[DataFile]]] = field(default_factory=dict)

    @property
    def n_files(self) -> int:
        return sum(len(b) for bins in self.bins.values() for b in bins)

    @property
    def n_bins(self) -> int:
        return sum(len(bins) for bins in self.bins.values())


def plan_compaction(
    table: Table,
    target_bytes: int = DEFAULT_TARGET_BYTES,
    small_threshold: float = 0.75,
    min_files_per_bin: int = 2,
    snapshot_id: int | None = None,
) -> CompactionPlan:
    """First-fit-decreasing bin packing of undersized files, per partition."""
    threshold = int(target_bytes * small_threshold)
    by_part: dict[str, list[DataFile]] = {}
    for f in table.live_files(snapshot_id):
        if f.bytes < threshold:
            by_part.setdefault(partition_key(f), []).append(f)

    plan = CompactionPlan()
    for pk, files in sorted(by_part.items()):
        files.sort(key=lambda f: f.bytes, reverse=True)  # FFD
        bins: list[list[DataFile]] = []
        sizes: list[int] = []
        for f in files:
            for i, s in enumerate(sizes):
                if s + f.bytes <= target_bytes:
                    bins[i].append(f)
                    sizes[i] += f.bytes
                    break
            else:
                bins.append([f])
                sizes.append(f.bytes)
        bins = [b for b in bins if len(b) >= min_files_per_bin]
        if bins:
            plan.bins[pk] = bins
    return plan


def compact(
    spark: SparkSession,
    table: Table,
    target_bytes: int = DEFAULT_TARGET_BYTES,
    small_threshold: float = 0.75,
    min_files_per_bin: int = 2,
    job_id: str | None = None,
    max_concurrency: int = 4,
    fail_after_partitions: int | None = None,  # test hook: simulate a kill
) -> dict:
    """Run compaction; returns a report. Re-run with the same ``job_id`` to
    resume after a kill (completed partitions are skipped)."""
    job_id = job_id or f"compact-{uuid.uuid4().hex[:12]}"
    log = CommitLog(table.root, job_id)
    # pin planning to the job's base snapshot: a resumed run reproduces the
    # identical deterministic plan, so completed group keys line up.
    meta = log.init_job({"base_snapshot": table.current_snapshot_id(), "target_bytes": target_bytes})
    plan = plan_compaction(
        table, target_bytes, small_threshold, min_files_per_bin, snapshot_id=meta["base_snapshot"]
    )
    done = log.completed_partitions()
    # work unit = one file group (bin): finest resume granularity, and bins
    # of the same partition rewrite concurrently (Iceberg rewrite file-groups)
    todo = [
        (f"{pk}#bin{i}", group)
        for pk, bins in plan.bins.items()
        for i, group in enumerate(bins)
        if f"{pk}#bin{i}" not in done
    ]
    skipped = plan.n_bins - len(todo)
    if fail_after_partitions is not None:
        todo = todo[:fail_after_partitions]

    has_tokens = "n_tok" in table.schema.fieldNames()
    commit_mutex = threading.Lock()

    def run_group(group_key: str, in_files: list[DataFile]) -> dict:
        t0 = time.monotonic()
        df = table.read_files(spark, in_files)
        aggs = [F.count(F.lit(1)).alias("rows")]
        if has_tokens:
            aggs.append(F.sum(F.col("n_tok").cast("long")).alias("tokens"))
        metrics = df.agg(*aggs).collect()[0]
        out_files = table.write_datafiles(df, num_files=1, use_coalesce=True)
        with commit_mutex:  # snapshot chain is single-writer
            sid = table.commit(
                out_files,
                {f.path for f in in_files},
                "compact",
                {"group": group_key, "job_id": job_id},
            )
            log.record(
                partition=group_key,
                input_files=[f.path for f in in_files],
                output_files=[f.path for f in out_files],
                snapshot_id=sid,
                rows=metrics["rows"],
                bytes_=sum(f.bytes for f in out_files),
                tokens=int(metrics["tokens"]) if has_tokens and metrics["tokens"] else 0,
                seconds=time.monotonic() - t0,
            )
        return {"group": group_key, "in": len(in_files), "out": len(out_files), "snapshot": sid}

    results = []
    if todo:
        with ThreadPoolExecutor(max_workers=max_concurrency) as pool:
            results = list(pool.map(lambda a: run_group(*a), todo))

    entries = log.entries()
    return {
        "job_id": job_id,
        "planned_partitions": len(plan.bins),
        "planned_groups": plan.n_bins,
        "resumed_skipped": skipped,
        "executed": results,
        "files_in": sum(len(e["input_files"]) for e in entries),
        "files_out": sum(len(e["output_files"]) for e in entries),
        "rows": sum(e["rows"] for e in entries),
        "tokens": sum(e["tokens"] for e in entries),
        "seconds": sum(e["seconds"] for e in entries),
    }
