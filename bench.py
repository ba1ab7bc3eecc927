"""Benchmark entry: headline queries + the maintenance flagship.

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., ...extras}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS   (default 32).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from batch_pipeline_via_lakehouse_spark.plans.queries import QUERIES  # noqa: E402
from batch_pipeline_via_lakehouse_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "pricing_summary",
    "filter_project",
    "topn_per_group",
    "dedup_latest",
    "forward_fill",
    "rolling_window",
    "join_enrich",
    "asof_join",
    "merge_upsert",
    "grouped_features",
    "exact_dedup",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "dedup_clusters",
    "simhash",
    "langid",
    "repetition_ratio",
    "decontaminate",
    "quality_score",
    "ann_topk",
    "ann_kmeans_topk",
    "embedding_neardup",
    "ann_lsh_buckets",
    "pack_sequences",
    "pack_windows",
    "stratified_sample",
]

# maintenance table sizing: rows scale with sf (sf0.1 -> 120k sequences,
# ~250M tokens through compact+cluster)
MAINT_ROWS = {"0.001": 2_000, "0.01": 12_000, "0.1": 120_000}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # untimed warmup before the timed loop (mirrors the maintenance bench's
    # warmup pass): first-query JVM class-loading / codegen / Python-worker
    # spawn / Arrow arena growth otherwise all land in whichever query runs
    # first, making its number incomparable across rounds. Warm each
    # execution path (JVM scan+agg, vectorized pandas UDF, grouped-map) on
    # the smallest SF so the warmup itself is cheap.
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for name in ("pricing_summary", "ann_lsh_buckets", "grouped_features"):
        QUERIES[name](spark, warm_dir).count()

    # median-of-3 per query: the host's contention is episodic (identical
    # runs swing 2-3x minutes apart), so single-shot per-query numbers were
    # not comparable across rounds. Median damps the swing; every pass is
    # kept in the JSON under "query_passes".
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    timings: dict[str, float] = {}
    query_passes: dict[str, list[float]] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        passes = []
        n = 0
        for _ in range(reps):
            t0 = time.monotonic()
            df = fn(spark, sf_dir)
            n = df.count()  # materialize the full plan
            passes.append(round(time.monotonic() - t0, 3))
        query_passes[name] = passes
        timings[name] = sorted(passes)[len(passes) // 2]
        print(f"# {name}: median {timings[name]}s of {passes} ({n} rows)", file=sys.stderr)

    maint_rows = MAINT_ROWS.get(sf, max(2000, int(float(sf) * 1_200_000)))
    # 8MB target: compaction bins and cluster cells both get >= 2 task waves
    # at local[32], so the maintenance phases can actually use the cores.
    # The host's contention is episodic (identical runs swing 2-3x minutes
    # apart), so the recorded number is the MEDIAN of 3 timed passes over
    # byte-identical copies of one untimed build — same damping as the
    # scaling protocol; all passes are reported.
    import shutil
    import tempfile

    from batch_pipeline_via_lakehouse_spark.bench_core import (
        build_fragmented_table,
        run_maintenance_on_existing,
    )
    from batch_pipeline_via_lakehouse_spark.operators.clustering import cluster
    from batch_pipeline_via_lakehouse_spark.table import Table

    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    base = tempfile.mkdtemp(prefix="bench-tok-", dir=os.environ.get("SPARK_GRAFT_BENCH_DIR", shm))
    src = os.path.join(base, "src")
    build_fragmented_table(spark, src, maint_rows, fragment_files=64)
    runs = []
    for i in range(3):
        dst = os.path.join(base, f"run{i}")
        shutil.copytree(src, dst)
        r = run_maintenance_on_existing(
            spark, dst, target_bytes=8 * 1024 * 1024, warmup=(i == 0)
        )
        print(f"# maintenance pass {i}: {r}", file=sys.stderr)
        runs.append((r, dst))
    runs.sort(key=lambda rd: rd[0]["tokens_per_s"])
    maint = runs[len(runs) // 2][0]

    # Hilbert parity pass: MEDIAN of 3 like everything else (the round-4
    # single-shot number swung 2.2x with unchanged code — uninterpretable on
    # this host). The three maintained run dirs are equivalent tables, so
    # each gets one timed Hilbert re-cluster.
    hilbert_passes = []
    for _, dst in runs:
        t0 = time.monotonic()
        cluster(spark, Table.load(dst), mode="hilbert", target_bytes=8 * 1024 * 1024)
        hilbert_passes.append(round(time.monotonic() - t0, 2))
    maint["hilbert_passes_s"] = hilbert_passes
    maint["hilbert_s"] = sorted(hilbert_passes)[len(hilbert_passes) // 2]
    maint["hilbert_tokens_per_s"] = round(maint["tokens"] / maint["hilbert_s"], 1)
    maint["all_passes_tokens_per_s"] = [r["tokens_per_s"] for r, _ in runs]
    shutil.rmtree(base, ignore_errors=True)

    timings["maintenance_compact_zorder"] = maint["maintenance_s"]
    print(f"# maintenance (median pass): {maint}", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    # the driver captures a bounded tail of stdout: the final line must stay
    # COMPACT (round-4's inline query_passes outgrew the window and arrived
    # decapitated — "parsed": null). Per-pass detail goes to a file instead.
    detail_file = os.path.join(".benchmarks", "bench_detail.json")
    os.makedirs(".benchmarks", exist_ok=True)
    with open(detail_file, "w") as fh:
        json.dump(
            {
                "query_passes": query_passes,
                "maintenance": maint,
                "sf": float(sf),
                "cpus": cpus,
            },
            fh,
            indent=1,
        )
    result = {
        "metric": "headline query suite + compaction/Z-order maintenance wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
        "cpus": cpus,
        "maintenance_tokens_per_s": maint["tokens_per_s"],
        "maintenance_sequences_per_s": maint["sequences_per_s"],
        "hilbert_tokens_per_s": maint["hilbert_tokens_per_s"],
        "detail_file": detail_file,
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
