"""Z-order / Hilbert clustering rewrite.

The physical-layout operator the reference never has (SURVEY.md §2.6 note:
"the new engine's Z-order pass is exactly a global sort"): compute a
space-filling-curve key over (n_tok, hash(source), hash(doc_id)), then
``repartitionByRange(num_files, zkey).sortWithinPartitions(zkey)`` and
rewrite. Range partitioning samples the key distribution, so skewed sources
still yield balanced output files; the key itself is hash-mixed, which
de-clusters hot source values across ranges.

Partitioned tables cluster within each identity partition over the remaining
dims (what Iceberg's sort-order rewrite does); unpartitioned tables cluster
globally in 3 dims. The payoff is measurable, not aesthetic: post-cluster
manifests carry tight per-file min/max on the sort dims, so point/range scans
skip most files (asserted in tests).
"""

from __future__ import annotations

import threading
import time
import uuid
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..sources.scan import partition_key
from ..table.catalog import Table
from ..table.format import DataFile
from ..functions.zorder import cluster_key_column
from .commitlog import CommitLog

_KEY = "_zkey"


def cluster(
    spark: SparkSession,
    table: Table,
    mode: str = "zorder",  # zorder | hilbert
    numeric_col: str = "n_tok",
    hash_cols: tuple[str, ...] = ("source", "doc_id"),
    target_bytes: int = 128 * 1024 * 1024,
    job_id: str | None = None,
    snapshot_id: int | None = None,
    max_concurrency: int = 4,
) -> dict:
    """Rewrite the table clustered by a Z/Hilbert key; one commit + commit-log
    entry per identity partition (resumable with the same ``job_id``)."""
    job_id = job_id or f"cluster-{mode}-{uuid.uuid4().hex[:12]}"
    log = CommitLog(table.root, job_id)
    meta = log.init_job(
        {"base_snapshot": snapshot_id if snapshot_id is not None else table.current_snapshot_id(),
         "mode": mode}
    )
    base = meta["base_snapshot"]

    files = table.live_files(base)
    if not files:
        return {"job_id": job_id, "partitions": 0, "tokens": 0, "rows": 0, "seconds": 0.0}

    # scale bounds for the numeric dim come from manifests (metadata only)
    los = [f.stat(numeric_col, "min") for f in files if f.stat(numeric_col, "min") is not None]
    his = [f.stat(numeric_col, "max") for f in files if f.stat(numeric_col, "max") is not None]
    lo, hi = (float(min(los)), float(max(his))) if los else (0.0, 1.0)

    # inside an identity partition the partition col is constant — drop it
    # from the key dims so its bits don't waste key space
    part_cols = set(table.partition_cols)
    by_part: dict[str, list[DataFile]] = {}
    for f in files:
        by_part.setdefault(partition_key(f), []).append(f)

    done = log.completed_partitions()
    has_tokens = "n_tok" in table.schema.fieldNames()
    commit_mutex = threading.Lock()

    def run_partition(pk: str, pfiles: list[DataFile]) -> dict:
        t0 = time.monotonic()
        dims = [c for c in hash_cols if c not in part_cols]
        key = cluster_key_column(mode, numeric_col, dims, lo, hi)
        df = table.read_files(spark, pfiles).withColumn(_KEY, key)
        total_bytes = sum(f.bytes for f in pfiles)
        num_out = max(1, round(total_bytes / target_bytes))
        clustered = (
            df.repartitionByRange(num_out, F.col(_KEY))
            .sortWithinPartitions(_KEY)
            .drop(_KEY)
        )
        aggs = [F.count(F.lit(1)).alias("rows")]
        if has_tokens:
            aggs.append(F.sum(F.col("n_tok").cast("long")).alias("tokens"))
        m = table.read_files(spark, pfiles).agg(*aggs).collect()[0]
        out_files = table.write_datafiles(clustered)
        with commit_mutex:  # snapshot chain is single-writer
            sid = table.commit(
                out_files, {f.path for f in pfiles}, "cluster", {"partition": pk, "mode": mode}
            )
            log.record(
                partition=pk,
                input_files=[f.path for f in pfiles],
                output_files=[f.path for f in out_files],
                snapshot_id=sid,
                rows=m["rows"],
                bytes_=sum(f.bytes for f in out_files),
                tokens=int(m["tokens"]) if has_tokens and m["tokens"] else 0,
                seconds=time.monotonic() - t0,
            )
        return {"partition": pk, "out_files": len(out_files), "snapshot": sid}

    todo = [(pk, pfiles) for pk, pfiles in sorted(by_part.items()) if pk not in done]
    reports = []
    if todo:
        with ThreadPoolExecutor(max_workers=max_concurrency) as pool:
            reports = list(pool.map(lambda a: run_partition(*a), todo))

    entries = log.entries()
    return {
        "job_id": job_id,
        "mode": mode,
        "partitions": len(entries),
        "rows": sum(e["rows"] for e in entries),
        "tokens": sum(e["tokens"] for e in entries),
        "seconds": sum(e["seconds"] for e in entries),
        "executed": reports,
    }
