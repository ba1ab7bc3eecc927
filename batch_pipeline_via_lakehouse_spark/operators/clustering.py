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

import numpy as np
import pandas as pd

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
    max_concurrency: int | None = None,
    key_impl: str = "jvm",  # 'jvm' codegen key (default) | 'arrow' NumPy UDF
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
    if max_concurrency is None:
        # bundles (below) are already wide range-shuffle jobs; a few
        # concurrent ones saturate the executors, and more only adds driver
        # GIL/py4j contention (measured: conc=16 tripled wall vs conc=4)
        max_concurrency = 4

    # --- bundle small partitions into few balanced jobs -------------------
    # One Spark job per identity partition would pay a fixed latency (range
    # sampling stage + shuffle stage + commit) 20+ times; with a skewed
    # partition layout most of those jobs are tiny, so the wall clock becomes
    # overhead-bound and stops scaling with cores. Instead: greedily pack
    # partitions into <= max_concurrency byte-balanced bundles and range-
    # partition each bundle on (partition cols..., zkey) — partition locality
    # is preserved by the composite sort key and the partitionBy write.
    todo = [(pk, pfiles) for pk, pfiles in by_part.items() if pk not in done]
    todo.sort(key=lambda kv: sum(f.bytes for f in kv[1]), reverse=True)
    bundles: list[list[tuple[str, list[DataFile]]]] = [[] for _ in range(max_concurrency)]
    bundle_bytes = [0] * max_concurrency
    for pk, pfiles in todo:
        i = bundle_bytes.index(min(bundle_bytes))
        bundles[i].append((pk, pfiles))
        bundle_bytes[i] += sum(f.bytes for f in pfiles)
    bundles = [b for b in bundles if b]

    dims = [c for c in hash_cols if c not in part_cols]
    key = cluster_key_column(mode, numeric_col, dims, lo, hi, impl=key_impl)

    # --- range bounds WITHOUT Spark's sampling pass ------------------------
    # repartitionByRange's sampler materializes full rows (token arrays
    # included) in an extra pass — measured ~4x the cost of the shuffle
    # itself. Instead: one column-pruned aggregate computes per-partition
    # zkey quantiles (reads only the key's input columns), rows get an exact
    # range-cell id from those bounds, and a plain hash shuffle on the cell
    # id moves each row once. The Arrow writer splits tasks per cell, so
    # every output file still covers one tight zkey range.
    _QUANT = 128
    probs = [i / _QUANT for i in range(1, _QUANT)]
    todo_pks = {pk for b in bundles for pk, _ in b}
    all_files = [f for b in bundles for _, fl in b for f in fl]
    slim = table.read_files(spark, all_files).withColumn(_KEY, key)
    grp = slim.groupBy(*table.partition_cols) if table.partition_cols else slim.groupBy()
    qrows = grp.agg(F.percentile_approx(_KEY, probs, 10_000).alias("q")).collect()

    def pk_of(row) -> str:
        import json as _json

        return _json.dumps({c: str(row[c]) for c in table.partition_cols}, sort_keys=True)

    bounds_by_pk: dict[str, list[int]] = {}
    for r in qrows:
        pk = pk_of(r)
        if pk not in todo_pks:
            continue
        nb = max(1, round(sum(f.bytes for f in by_part[pk]) / target_bytes))
        qs = [int(v) for v in (r["q"] or [])]
        step = max(1, len(qs) // nb) if nb > 1 else len(qs) + 1
        bounds_by_pk[pk] = qs[step - 1 :: step][: nb - 1] if nb > 1 else []

    def pid_expr() -> F.Column:
        """Vectorized range-cell assignment: np.searchsorted against each
        partition's bounds (an Arrow pandas UDF — a 20-partition × 40-bound
        CASE/aggregate expression tree would blow past codegen limits and
        fall back to per-row interpretation)."""
        import json as _json

        from pyspark.sql.functions import pandas_udf

        part_cols_l = list(table.partition_cols)
        bounds_arr = {
            tuple(_json.loads(pk).get(c) for c in part_cols_l): np.array(b, dtype=np.int64)
            for pk, b in bounds_by_pk.items()
        }

        def assign(key: pd.Series, pcols: list[pd.Series]) -> pd.Series:
            out = np.zeros(len(key), dtype=np.int32)
            k = key.to_numpy(dtype=np.int64)
            pvals = pd.MultiIndex.from_arrays([p.astype(str) for p in pcols])
            codes, uniques = pd.factorize(pvals)
            for ui, u in enumerate(uniques):
                b = bounds_arr.get(u if isinstance(u, tuple) else (u,))
                if b is None or len(b) == 0:
                    continue
                mask = codes == ui
                out[mask] = np.searchsorted(b, k[mask], side="left")
            return pd.Series(out)

        if len(part_cols_l) == 1:

            @pandas_udf("int")
            def pid_udf1(key: pd.Series, p0: pd.Series) -> pd.Series:
                return assign(key, [p0])

            return pid_udf1(F.col(_KEY), F.col(part_cols_l[0]))

        if len(part_cols_l) == 2:

            @pandas_udf("int")
            def pid_udf2(key: pd.Series, p0: pd.Series, p1: pd.Series) -> pd.Series:
                return assign(key, [p0, p1])

            return pid_udf2(F.col(_KEY), F.col(part_cols_l[0]), F.col(part_cols_l[1]))

        if part_cols_l:
            raise NotImplementedError("clustering supports at most 2 identity-partition columns")

        b_global = next(iter(bounds_arr.values()), np.array([], dtype=np.int64))

        @pandas_udf("int")
        def pid_udf0(key: pd.Series) -> pd.Series:
            if len(b_global) == 0:
                return pd.Series(np.zeros(len(key), dtype=np.int32))
            return pd.Series(
                np.searchsorted(b_global, key.to_numpy(dtype=np.int64), side="left").astype(np.int32)
            )

        return pid_udf0(F.col(_KEY))

    def run_bundle(bundle: list[tuple[str, list[DataFile]]]) -> list[dict]:
        t0 = time.monotonic()
        pfiles = [f for _, files in bundle for f in files]
        df = (
            table.read_files(spark, pfiles)
            .withColumn(_KEY, key)
            .withColumn("_pid", pid_expr())
        )
        n_cells = sum(len(bounds_by_pk.get(pk, [])) + 1 for pk, _ in bundle)
        shuffled = df.repartition(max(1, n_cells), *table.partition_cols, F.col("_pid"))
        import uuid as _uuid
        from ..table.arrow_io import arrow_rewrite_job

        tracked = [
            f.name for f in table.schema.fields
            if f.dataType.typeName() not in ("array", "map", "struct")
        ]
        sums = [
            f.name for f in table.schema.fields
            if f.dataType.typeName() in ("integer", "long", "float", "double")
        ]
        commit_rel = f"data/{_uuid.uuid4().hex}"
        out_files = arrow_rewrite_job(
            shuffled,
            table.root,
            commit_rel,
            table.partition_cols,
            tracked,
            sums,
            sort_by=[*table.partition_cols, _KEY],
            drop_cols=[_KEY],
            split_extra_cols=["_pid"],
        )
        seconds = time.monotonic() - t0

        # per-partition lineage: split in/out files by identity partition
        out_by_pk: dict[str, list[DataFile]] = {}
        for f in out_files:
            out_by_pk.setdefault(partition_key(f), []).append(f)
        results = []
        with commit_mutex:  # snapshot chain is single-writer
            sid = table.commit(
                out_files,
                {f.path for f in pfiles},
                "cluster",
                {"partitions": [pk for pk, _ in bundle], "mode": mode},
            )
            for pk, in_f in bundle:
                out_f = out_by_pk.get(pk, [])
                log.record(
                    partition=pk,
                    input_files=[f.path for f in in_f],
                    output_files=[f.path for f in out_f],
                    snapshot_id=sid,
                    rows=sum(f.rows for f in out_f),
                    bytes_=sum(f.bytes for f in out_f),
                    tokens=sum(int(f.stat("n_tok", "sum") or 0) for f in out_f) if has_tokens else 0,
                    seconds=round(seconds / len(bundle), 3),
                )
                results.append({"partition": pk, "out_files": len(out_f), "snapshot": sid})
        return results

    reports = []
    if bundles:
        with ThreadPoolExecutor(max_workers=max_concurrency) as pool:
            for rs in pool.map(run_bundle, bundles):
                reports.extend(rs)

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
