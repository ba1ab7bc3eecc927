"""Shared bench harness: the compaction+Z-order maintenance job (the
north-rule metric) and the headline query set."""

from __future__ import annotations

import os
import shutil
import tempfile
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .datagen import TOKEN_SCHEMA, token_table_df
from .operators.clustering import cluster
from .operators.compaction import compact
from .table import Table


def _warmup_pass(spark, root: str, n_rows: int, fragment_files: int, target_bytes: int) -> None:
    """Untimed mini maintenance pass: spawns every Python worker, JIT-compiles
    the JVM hot paths, and grows worker allocator arenas to working-set size —
    one-time costs that otherwise land in (and distort) the first timed phase,
    disproportionately at high core counts. The scratch table gets a unique
    dir (and is removed in finally-order by the rmtree below): a fixed name
    would collide with leftovers of a killed prior run (Table.create refuses
    to reuse a directory) and with sibling benches sharing one parent."""
    import uuid

    wdir = os.path.join(root, f"warmup-{uuid.uuid4().hex[:8]}")
    try:
        wt = Table.create(wdir, TOKEN_SCHEMA, partition_by=["source"])
        wt.append_native(
            token_table_df(spark, max(4000, n_rows // 20), seed=1),
            num_files=max(8, fragment_files // 4),
        )
        compact(spark, wt, target_bytes=target_bytes)
        cluster(spark, wt, mode="zorder", target_bytes=target_bytes)
    finally:
        shutil.rmtree(wdir, ignore_errors=True)


def build_fragmented_table(
    spark: SparkSession, root: str, n_rows: int, seed: int = 42, fragment_files: int = 64
) -> Table:
    """Deterministic fragmented token table — the maintenance job's input."""
    t = Table.create(root, TOKEN_SCHEMA, partition_by=["source"])
    t.append_native(token_table_df(spark, n_rows, seed=seed), num_files=fragment_files)
    return t


def run_maintenance_on_existing(
    spark: SparkSession,
    table_root: str,
    target_bytes: int = 32 * 1024 * 1024,
    warmup: bool = True,
) -> dict:
    """Timed compaction + Z-order clustering of an EXISTING table — the shape
    of a real maintenance job (spark-submit against a table someone else
    wrote), with ingest entirely outside the measured process. Row/token
    totals come from manifest stats (metadata only, no data scan)."""
    t = Table.load(table_root)
    live = t.live_files()
    n_rows = sum(f.rows for f in live)
    total_tokens = sum(int(f.stat("n_tok", "sum") or 0) for f in live)
    files_before = len(live)
    if warmup:
        _warmup_pass(
            spark, os.path.dirname(table_root.rstrip("/")), n_rows, files_before, target_bytes
        )

    t0 = time.monotonic()
    compact(spark, t, target_bytes=target_bytes)
    t_compact = time.monotonic() - t0
    t0 = time.monotonic()
    cluster(spark, t, mode="zorder", target_bytes=target_bytes)
    t_cluster = time.monotonic() - t0

    maint = t_compact + t_cluster
    return {
        "rows": n_rows,
        "tokens": total_tokens,
        "files_before": files_before,
        "files_after": len(t.live_files()),
        "compact_s": round(t_compact, 2),
        "cluster_s": round(t_cluster, 2),
        "maintenance_s": round(maint, 2),
        "sequences_per_s": round(2 * n_rows / maint, 1),
        "tokens_per_s": round(2 * total_tokens / maint, 1),
    }


def run_maintenance_bench(
    spark: SparkSession,
    n_rows: int,
    seed: int = 42,
    fragment_files: int = 64,
    target_bytes: int = 32 * 1024 * 1024,
    keep_dir: str | None = None,
    max_concurrency: int | None = None,
    warmup: bool = True,
    hilbert: bool = False,
) -> dict:
    """Generate a fragmented token table, run compaction then Z-order
    clustering; return phase timings + throughput (sequences/s, tokens/s
    over the maintenance phases, which is the BASELINE.json metric).

    The table lives on tmpfs (/dev/shm) when available: the sandbox's virtio
    disk has low, highly variable throughput that would make every phase
    IO-ceiling-bound; on a real cluster aggregate disk bandwidth scales with
    executor count, which tmpfs approximates for scaling measurements."""
    base = os.environ.get(
        "SPARK_GRAFT_BENCH_DIR", "/dev/shm" if os.path.isdir("/dev/shm") else None
    )
    root = keep_dir or tempfile.mkdtemp(prefix="bench-tok-", dir=base)

    if warmup:
        _warmup_pass(spark, root, n_rows, fragment_files, target_bytes)

    table_dir = os.path.join(root, "tok")
    t = Table.create(table_dir, TOKEN_SCHEMA, partition_by=["source"])

    t0 = time.monotonic()
    t.append_native(token_table_df(spark, n_rows, seed=seed), num_files=fragment_files)
    t_ingest = time.monotonic() - t0

    total_tokens = int(
        t.scan(spark).agg(F.sum(F.col("n_tok").cast("long"))).collect()[0][0]
    )
    files_before = len(t.live_files())

    t0 = time.monotonic()
    compact(spark, t, target_bytes=target_bytes, max_concurrency=max_concurrency)
    t_compact = time.monotonic() - t0

    t0 = time.monotonic()
    cluster(spark, t, mode="zorder", target_bytes=target_bytes, max_concurrency=max_concurrency)
    t_cluster = time.monotonic() - t0

    files_after = len(t.live_files())

    # Hilbert parity run (same data volume, re-clustered from the zorder
    # layout): timed separately so the headline maintenance_s metric stays
    # comparable across rounds while both curve modes carry a number.
    t_hilbert = None
    if hilbert:
        t0 = time.monotonic()
        cluster(spark, t, mode="hilbert", target_bytes=target_bytes)
        t_hilbert = time.monotonic() - t0

    maint = t_compact + t_cluster
    out = {
        "rows": n_rows,
        "tokens": total_tokens,
        "files_before": files_before,
        "files_after": files_after,
        "ingest_s": round(t_ingest, 2),
        "compact_s": round(t_compact, 2),
        "cluster_s": round(t_cluster, 2),
        "maintenance_s": round(maint, 2),
        "sequences_per_s": round(2 * n_rows / maint, 1),  # each row passes compact+cluster
        "tokens_per_s": round(2 * total_tokens / maint, 1),
    }
    if t_hilbert is not None:
        out["hilbert_s"] = round(t_hilbert, 2)
        out["hilbert_tokens_per_s"] = round(total_tokens / t_hilbert, 1)
    if keep_dir is None:
        shutil.rmtree(root, ignore_errors=True)
    return out
